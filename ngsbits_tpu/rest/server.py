"""GSvar server application (HTTP API for file/metadata access).

Behavioral reference: ngs-bits src/GSvarServer — endpoints registered in
GSvarServer/main.cpp:38-90 and handled in ServerController.cpp: index/info/
help, login/logout/session (ServerController.cpp:1244-1353), static and temp
file serving with byte ranges, upload, file_location / processed_sample_path
(NGSD-backed). TLS in the reference comes from cppREST SslServer; here the
server speaks plain HTTP by default and HTTPS when an ``ssl_context`` is
supplied (deployments put it behind the platform's TLS terminator).

The server is stdlib-only (ThreadingHTTPServer) — the heavy lifting (BAM
slicing etc.) is done by the framework's IO layer on demand.
"""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .endpoints import AuthType, Endpoint, EndpointManager, ParamCategory, ParamProps
from .sessions import SessionManager, UrlManager

_INDEX_HTML = (b"<html><head><title>GSvar server</title></head>"
               b"<body><h1>GSvar server</h1>"
               b"<p>API documentation is available at the /help endpoint.</p>"
               b"</body></html>")


class GSvarServer:
    """Threaded HTTP API server exposing the GSvarServer endpoint set."""

    def __init__(self, server_root: str, users: dict | None = None,
                 ngsd=None, port: int = 0, host: str = "127.0.0.1",
                 session_duration: int = 3600, ssl_context=None):
        self.server_root = os.path.abspath(server_root)
        self.users = users or {}
        self.ngsd = ngsd
        self.sessions = SessionManager(valid_period=session_duration)
        self.urls = UrlManager()
        self.endpoints = EndpointManager()
        self._start_time = time.time()
        self._register_endpoints()
        handler = _make_handler(self)
        self._httpd = ThreadingHTTPServer((host, port), handler)
        if ssl_context is not None:
            self._httpd.socket = ssl_context.wrap_socket(
                self._httpd.socket, server_side=True)
        self._thread: threading.Thread | None = None

    # ---- lifecycle ----
    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self):
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    # ---- endpoint registration (mirrors GSvarServer/main.cpp:38-) ----
    def _register_endpoints(self):
        ep = self.endpoints.append
        ep(Endpoint("", {}, "GET", "text/html", AuthType.NONE,
                    "Index page with general information", self._index))
        ep(Endpoint("", {}, "HEAD", "text/html", AuthType.NONE,
                    "Size of the index page", self._index))
        ep(Endpoint("favicon.ico", {}, "GET", "image/png", AuthType.NONE,
                    "Favicon to avoid warnings from the browser", self._favicon))
        ep(Endpoint("info", {}, "GET", "application/json", AuthType.NONE,
                    "General information about this API", self._info))
        ep(Endpoint("help", {}, "GET", "text/plain", AuthType.NONE,
                    "API help pages", self._help))
        ep(Endpoint("login", {
            "name": ParamProps(ParamCategory.POST_URL_ENCODED, True, "User name"),
            "password": ParamProps(ParamCategory.POST_URL_ENCODED, True, "Password"),
        }, "POST", "text/plain", AuthType.NONE,
            "Secure token generation, the token will be used to access protected resources",
            self._login))
        ep(Endpoint("session", {
            "token": ParamProps(ParamCategory.ANY, True, "Secure token"),
        }, "GET", "application/json", AuthType.USER_TOKEN,
            "Information about the current session", self._session_info))
        ep(Endpoint("validate_credentials", {
            "name": ParamProps(ParamCategory.POST_URL_ENCODED, True, "User name"),
            "password": ParamProps(ParamCategory.POST_URL_ENCODED, True, "Password"),
        }, "POST", "text/plain", AuthType.NONE,
            "Checks if provided login and password are valid", self._validate_credentials))
        ep(Endpoint("logout", {
            "token": ParamProps(ParamCategory.POST_URL_ENCODED, True, "Secure token"),
        }, "POST", "text/plain", AuthType.USER_TOKEN,
            "Destroys the user's session and invalidates the token", self._logout))
        for method in ("GET", "HEAD"):
            ep(Endpoint("static", {
                "filename": ParamProps(ParamCategory.PATH_PARAM, True, "File to serve"),
                "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
            }, method, "application/octet-stream", AuthType.USER_TOKEN,
                "Static content served from the server root folder", self._static))
            ep(Endpoint("temp", {
                "id": ParamProps(ParamCategory.PATH_PARAM, True, "Temporary URL id"),
            }, method, "application/octet-stream", AuthType.NONE,
                "Temporary URL file streaming", self._temp))
        ep(Endpoint("upload", {
            "token": ParamProps(ParamCategory.ANY, True, "Secure token"),
            "filename": ParamProps(ParamCategory.GET_URL_PARAM, True, "Target file name"),
        }, "POST", "text/plain", AuthType.USER_TOKEN,
            "File upload to the server root folder", self._upload))
        ep(Endpoint("processed_sample_path", {
            "ps_id": ParamProps(ParamCategory.GET_URL_PARAM, True, "Processed sample id"),
            "type": ParamProps(ParamCategory.GET_URL_PARAM, False, "Path type"),
            "token": ParamProps(ParamCategory.ANY, True, "Secure token"),
        }, "GET", "application/json", AuthType.USER_TOKEN,
            "Temporary URL leading to a specific file of a processed sample",
            self._processed_sample_path))
        ep(Endpoint("clear_cache", {
            "token": ParamProps(ParamCategory.ANY, True, "Secure token"),
        }, "GET", "text/plain", AuthType.USER_TOKEN,
            "Removes expired sessions and URLs", self._clear_cache))

    # ---- auth helpers ----
    def _check_password(self, name: str, password: str) -> str:
        """'' on success, error message otherwise (NGSD::checkPassword)."""
        if self.ngsd is not None:
            try:
                return self.ngsd.check_password(name, password)
            except Exception as exc:  # pragma: no cover - db errors
                return str(exc)
        if name in self.users and self.users[name] == password:
            return ""
        return "Invalid username or password"

    def _user_id(self, name: str) -> int:
        if self.ngsd is not None:
            try:
                return self.ngsd.user_id(name)
            except Exception:
                return -1
        return abs(hash(name)) % (1 << 31)

    # ---- handlers: (request dict) -> (status, content_type, body bytes) ----
    def _index(self, req):
        return 200, "text/html", _INDEX_HTML

    def _favicon(self, req):
        # 1x1 transparent PNG
        import base64
        png = base64.b64decode(
            b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk"
            b"YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
        return 200, "image/png", png

    def _info(self, req):
        from .. import __version__
        body = json.dumps({
            "name": "GSvar server",
            "description": "GSvar server API (ngsbits-tpu)",
            "api_version": __version__,
            "start_time": int(self._start_time),
        }).encode()
        return 200, "application/json", body

    def _help(self, req):
        return 200, "text/plain", self.endpoints.help_text().encode()

    def _login(self, req):
        form = req["form"]
        if "name" not in form or "password" not in form:
            return 403, "text/plain", b"No username or/and password were found"
        message = self._check_password(form["name"], form["password"])
        if message:
            return 401, "text/plain", b"Invalid username or password"
        session = self.sessions.create_session(
            self._user_id(form["name"]), form["name"])
        return 200, "text/plain", session.secure_token.encode()

    def _validate_credentials(self, req):
        form = req["form"]
        message = self._check_password(form.get("name", ""), form.get("password", ""))
        return 200, "text/plain", message.encode()

    def _logout(self, req):
        token = req["form"].get("token") or req["params"].get("token", "")
        if not self.sessions.is_valid(token):
            return 403, "text/plain", b"You have provided an invalid token"
        self.sessions.remove(token)
        return 200, "text/plain", b"You have been logged out"

    def _session_info(self, req):
        session = self.sessions.get(req["token"])
        body = json.dumps({
            "user_id": session.user_id,
            "login_time": int(session.login_time),
            "is_db_token": session.is_for_db_only,
            "valid_period": self.sessions.valid_period,
        }).encode()
        return 200, "application/json", body

    def _static(self, req):
        rel = req["path_params"]
        target = os.path.abspath(os.path.join(self.server_root, *rel))
        if not target.startswith(self.server_root + os.sep) and target != self.server_root:
            return 403, "text/plain", b"Access denied"
        if not os.path.isfile(target):
            return 404, "text/plain", b"File not found"
        return 200, _guess_type(target), FilePayload(target)

    def _temp(self, req):
        rel = req["path_params"]
        if not rel:
            return 404, "text/plain", b"File not found"
        entity = self.urls.get(rel[0])
        if entity is None:
            return 404, "text/plain", b"Link expired or invalid"
        return 200, _guess_type(entity.filename), FilePayload(entity.filename_with_path)

    def _upload(self, req):
        filename = req["params"].get("filename", "")
        if not filename or "/" in filename or ".." in filename:
            return 400, "text/plain", b"Invalid file name"
        target = os.path.join(self.server_root, filename)
        with open(target, "wb") as fh:
            fh.write(req["body"])
        return 200, "text/plain", b"File has been uploaded"

    def _processed_sample_path(self, req):
        if self.ngsd is None:
            return 501, "text/plain", b"NGSD is not available"
        ps_id = req["params"].get("ps_id", "")
        path_type = req["params"].get("type", "SAMPLE_FOLDER")
        try:
            path = self.ngsd.processed_sample_path(ps_id, path_type)
        except Exception as exc:
            return 404, "text/plain", str(exc).encode()
        entity = self.urls.add_file(path)
        body = json.dumps([{
            "id": entity.string_id,
            "filename": entity.filename,
            "exists": os.path.exists(path),
        }]).encode()
        return 200, "application/json", body

    def _clear_cache(self, req):
        n = self.sessions.remove_expired() + self.urls.remove_expired()
        return 200, "text/plain", f"Removed {n} expired entries".encode()


class FilePayload:
    """Marker telling the dispatcher to stream from disk (range requests
    read only the requested slice — BAM/IGV streaming must not buffer the
    whole file per request)."""

    def __init__(self, path: str):
        self.path = path

    def size(self) -> int:
        return os.path.getsize(self.path)

    def read_range(self, start: int, end: int) -> bytes:
        with open(self.path, "rb") as fh:
            fh.seek(start)
            return fh.read(end - start + 1)


def _guess_type(path: str) -> str:
    import mimetypes
    return mimetypes.guess_type(path)[0] or "application/octet-stream"


def _make_handler(server: GSvarServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # silent by default
            pass

        def _dispatch(self, method: str):
            parsed = urllib.parse.urlparse(self.path)
            parts = [p for p in parsed.path.split("/") if p]
            name = parts[0] if parts else ""
            path_params = parts[1:]
            params = {k: v[0] for k, v in
                      urllib.parse.parse_qs(parsed.query).items()}

            body = b""
            length = int(self.headers.get("Content-Length") or 0)
            if length:
                body = self.rfile.read(length)
            form = {}
            ctype = self.headers.get("Content-Type", "")
            if method == "POST" and "octet-stream" not in ctype:
                form = {k: v[0] for k, v in
                        urllib.parse.parse_qs(body.decode(errors="replace")).items()}

            lookup_method = "GET" if method == "HEAD" else method
            endpoint = server.endpoints.get(name, lookup_method)
            if endpoint is None:
                exists = any(ep.url == name for ep in server.endpoints.endpoints())
                if exists:
                    self._send(405, "text/plain", b"Method not allowed", method)
                else:
                    self._send(404, "text/plain",
                               b"This action cannot be processed", method)
                return

            # auth (EndpointManager::isUserAuthorized)
            token = (params.get("token") or form.get("token")
                     or (self.headers.get("Authorization") or "").removeprefix("Bearer "))
            if endpoint.auth_type == AuthType.USER_TOKEN:
                if not server.sessions.is_valid(token):
                    self._send(401, "text/plain",
                               b"You are not authorized to access this endpoint",
                               method)
                    return

            req = {"params": params, "form": form, "body": body,
                   "path_params": path_params, "token": token,
                   "headers": self.headers, "method": method}
            try:
                status, content_type, data = endpoint.handler(req)
            except Exception as exc:  # noqa: BLE001 — worker catch-all
                self._send(500, "text/plain", str(exc).encode(), method)
                return

            is_file = isinstance(data, FilePayload)
            total = data.size() if is_file else len(data)

            # byte ranges (HttpResponse.cpp:182-)
            range_header = self.headers.get("Range")
            if status == 200 and range_header and method in ("GET", "HEAD"):
                ranges = _parse_range(range_header, total)
                if ranges is None:
                    self.send_response(416)
                    self.send_header("Content-Range", f"bytes */{total}")
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                start, end = ranges
                self.send_response(206)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Range",
                                 f"bytes {start}-{end}/{total}")
                self.send_header("Accept-Ranges", "bytes")
                self.send_header("Content-Length", str(end - start + 1))
                self.end_headers()
                if method != "HEAD":
                    # only the requested slice is read from disk
                    chunk = (data.read_range(start, end) if is_file
                             else data[start:end + 1])
                    self.wfile.write(chunk)
                return

            if is_file:
                self.send_response(status)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(total))
                self.send_header("Accept-Ranges", "bytes")
                self.end_headers()
                if method != "HEAD":
                    with open(data.path, "rb") as fh:
                        while True:
                            chunk = fh.read(1 << 20)
                            if not chunk:
                                break
                            self.wfile.write(chunk)
                return
            self._send(status, content_type, data, method)

        def _send(self, status, content_type, data, method):
            self.send_response(status)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(data)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()
            if method != "HEAD":
                self.wfile.write(data)

        def do_GET(self):
            self._dispatch("GET")

        def do_HEAD(self):
            self._dispatch("HEAD")

        def do_POST(self):
            self._dispatch("POST")

    return Handler


def _parse_range(header: str, size: int):
    """Single byte range 'bytes=a-b' -> (start, end) or None if unsatisfiable."""
    if not header.startswith("bytes="):
        return None
    spec = header[6:].split(",")[0].strip()
    start_s, _, end_s = spec.partition("-")
    try:
        if start_s == "":
            n = int(end_s)
            if n == 0:
                return None
            return max(0, size - n), size - 1
        start = int(start_s)
        end = int(end_s) if end_s else size - 1
    except ValueError:
        return None
    if start >= size:
        return None
    return start, min(end, size - 1)
