"""Session and temporary-URL management.

Behavioral reference: ngs-bits cppREST SessionManager.{h,cpp} (token-keyed
thread-safe session store, DEFAULT_VALID_PERIOD=3600 s, expiry sweep) and
UrlManager.{h,cpp} (temporary URL ids mapping to absolute file paths, used by
the "temp" endpoint for IGV/file streaming).
"""

from __future__ import annotations

import secrets
import threading
import time
from dataclasses import dataclass, field


DEFAULT_VALID_PERIOD = 3600  # seconds (SessionManager.h:13)


@dataclass
class Session:
    user_id: int = -1
    user_login: str = ""
    user_name: str = ""
    login_time: float = field(default_factory=time.time)
    is_for_db_only: bool = False
    secure_token: str = ""
    # per-session random secret handed out by the 'secret' endpoint
    # (Session ctor Helper::randomString(128) in ServerController.cpp:1392)
    random_secret: str = field(default_factory=lambda: secrets.token_hex(64))

    def is_expired(self, valid_period: int = DEFAULT_VALID_PERIOD) -> bool:
        return (time.time() - self.login_time) > valid_period


class SessionManager:
    """Thread-safe token -> Session store."""

    def __init__(self, valid_period: int = DEFAULT_VALID_PERIOD):
        self._lock = threading.Lock()
        self._sessions: dict[str, Session] = {}
        self.valid_period = valid_period

    def create_session(self, user_id: int, user_login: str, user_name: str = "",
                       is_for_db_only: bool = False) -> Session:
        token = secrets.token_hex(20)
        session = Session(user_id=user_id, user_login=user_login,
                          user_name=user_name, is_for_db_only=is_for_db_only,
                          secure_token=token)
        with self._lock:
            self._sessions[token] = session
        return session

    def add(self, session: Session):
        with self._lock:
            self._sessions[session.secure_token] = session

    def remove(self, token: str):
        with self._lock:
            self._sessions.pop(token, None)

    def get(self, token: str) -> Session | None:
        with self._lock:
            return self._sessions.get(token)

    def all_sessions(self) -> list[Session]:
        with self._lock:
            return list(self._sessions.values())

    def is_valid(self, token: str) -> bool:
        session = self.get(token)
        return session is not None and not session.is_expired(self.valid_period)

    def remove_expired(self) -> int:
        with self._lock:
            expired = [t for t, s in self._sessions.items()
                       if s.is_expired(self.valid_period)]
            for t in expired:
                del self._sessions[t]
            return len(expired)


@dataclass
class UrlEntity:
    string_id: str
    filename: str = ""
    path: str = ""               # absolute path on the server
    filename_with_path: str = ""
    created: float = field(default_factory=time.time)


class UrlManager:
    """Temporary URL ids for file streaming (UrlManager.{h,cpp})."""

    URL_LIFETIME = 600  # seconds

    def __init__(self, lifetime: int = URL_LIFETIME):
        self._lock = threading.Lock()
        self._urls: dict[str, UrlEntity] = {}
        self.lifetime = lifetime

    def add_file(self, filename_with_path: str) -> UrlEntity:
        import os
        string_id = secrets.token_urlsafe(16)
        entity = UrlEntity(
            string_id=string_id,
            filename=os.path.basename(filename_with_path),
            path=os.path.dirname(filename_with_path),
            filename_with_path=filename_with_path,
        )
        with self._lock:
            self._urls[string_id] = entity
        return entity

    def get(self, string_id: str) -> UrlEntity | None:
        with self._lock:
            entity = self._urls.get(string_id)
        if entity is None:
            return None
        if (time.time() - entity.created) > self.lifetime:
            self.remove(string_id)
            return None
        return entity

    def remove(self, string_id: str):
        with self._lock:
            self._urls.pop(string_id, None)

    def remove_expired(self) -> int:
        now = time.time()
        with self._lock:
            expired = [i for i, e in self._urls.items()
                       if (now - e.created) > self.lifetime]
            for i in expired:
                del self._urls[i]
            return len(expired)
