"""Endpoint registry with parameter specs, auth types and help generation.

Behavioral reference: ngs-bits cppREST EndpointManager.{h,cpp} and the
Endpoint/ParamProps structs in HttpParts.h — endpoints are keyed by
(url, method); parameters are declared as PATH_PARAM / GET_URL_PARAM /
POST_* / ANY with a required flag; AuthType is NONE / USER_TOKEN / DB_TOKEN.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class ParamCategory(Enum):
    PATH_PARAM = "path"        # part of the URL path after the endpoint name
    GET_URL_PARAM = "query"    # ?key=value
    POST_URL_ENCODED = "form"
    POST_OCTET_STREAM = "body"
    ANY = "any"


class AuthType(Enum):
    NONE = "none"
    USER_TOKEN = "user_token"
    DB_TOKEN = "db_token"


@dataclass
class ParamProps:
    category: ParamCategory
    mandatory: bool = False
    comment: str = ""


@dataclass
class Endpoint:
    url: str
    params: dict = field(default_factory=dict)     # name -> ParamProps
    method: str = "GET"
    content_type: str = "text/html"
    auth_type: AuthType = AuthType.NONE
    comment: str = ""
    handler: object = None


class EndpointManager:
    """Registry of endpoints; lookup by (url, method)."""

    def __init__(self):
        self._endpoints: list[Endpoint] = []

    def append(self, endpoint: Endpoint):
        self._endpoints.append(endpoint)

    def get(self, url: str, method: str) -> Endpoint | None:
        for ep in self._endpoints:
            if ep.url == url and ep.method == method:
                return ep
        return None

    def endpoints(self) -> list[Endpoint]:
        return list(self._endpoints)

    def validate_params(self, endpoint: Endpoint, params: dict) -> str:
        """Returns an error message for missing mandatory params, or ''."""
        for name, props in endpoint.params.items():
            if props.mandatory and name not in params:
                return f"Parameter '{name}' is missing"
        return ""

    def help_text(self, url: str | None = None) -> str:
        """Plain-text API summary (EndpointManager::generateGlobalHelp)."""
        lines = []
        for ep in self._endpoints:
            if url is not None and ep.url != url:
                continue
            lines.append(f"{ep.method} /{ep.url}".rstrip("/") or f"{ep.method} /")
            lines.append(f"  {ep.comment}")
            lines.append(f"  Content-Type: {ep.content_type}; "
                         f"Auth: {ep.auth_type.value}")
            for name, props in sorted(ep.params.items()):
                req = "required" if props.mandatory else "optional"
                lines.append(f"    {name} ({props.category.value}, {req}): "
                             f"{props.comment}")
            lines.append("")
        return "\n".join(lines)
