from .cascade import (FilterBase, FilterCascade, FilterResult,  # noqa: F401
                      create_filter, filter_names)
