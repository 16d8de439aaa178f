"""Every registered tool must resolve to a runnable class (no phantom
registrations) and respond to --help."""

from ngsbits_tpu.tools import TOOL_MODULES, get_tool


def test_all_tools_resolve():
    unresolved = []
    for name in sorted(TOOL_MODULES):
        try:
            cls = get_tool(name)
            tool = cls()
            assert hasattr(tool, "main")
        except Exception as exc:  # noqa: BLE001
            unresolved.append(f"{name}: {exc}")
    assert not unresolved, "\n".join(unresolved)


def test_inventory_complete():
    # the full ngs-bits CLI tool inventory (SURVEY.md §2.4)
    assert len(TOOL_MODULES) == 168
