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
        if ssl_context is None:
            # reference GSvarServer is TLS-only (cppREST/SslServer.cpp);
            # mirror its settings keys: when ssl_certificate/ssl_key are
            # configured (settings.ini or NGSBITS_SSL_* env), serve HTTPS
            from ..core import settings as _settings
            cert = _settings.string("ssl_certificate", optional=True)
            key = _settings.string("ssl_key", optional=True)
            if cert and key:
                import ssl as _ssl
                ssl_context = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
                ssl_context.load_cert_chain(cert, key)
        if ssl_context is not None:
            self._httpd.socket = ssl_context.wrap_socket(
                self._httpd.socket, server_side=True)
        self.uses_tls = ssl_context is not None
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
        ep(Endpoint("file_location", {
            "ps_url_id": ParamProps(ParamCategory.GET_URL_PARAM, True, "Processed sample URL id"),
            "type": ParamProps(ParamCategory.GET_URL_PARAM, True, "File type"),
            "multiple_files": ParamProps(ParamCategory.GET_URL_PARAM, False, "Return multiple files"),
            "return_if_missing": ParamProps(ParamCategory.GET_URL_PARAM, False, "Return missing files"),
            "locus": ParamProps(ParamCategory.GET_URL_PARAM, False, "Locus (repeat expansion images)"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "GET", "application/json", AuthType.USER_TOKEN,
            "Retrieve file location information for specific file types",
            self._file_location))
        for method in ("GET", "HEAD"):
            ep(Endpoint("assets", {
                "filename": ParamProps(ParamCategory.PATH_PARAM, True, "Asset file to serve"),
            }, method, "application/octet-stream", AuthType.NONE,
                "Asset file used for the testing purposes", self._assets))
        for method in ("GET", "HEAD"):
            ep(Endpoint("genome", {
                "filename": ParamProps(ParamCategory.PATH_PARAM, True, "Genome file to serve"),
            }, method, "application/octet-stream", AuthType.USER_TOKEN,
                "Genome stored on the server", self._genome))
        ep(Endpoint("analysis_job_gsvar_file", {
            "job_id": ParamProps(ParamCategory.GET_URL_PARAM, True, "Analysis job id"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "GET", "application/json", AuthType.USER_TOKEN,
            "FileLocation object with the information about GSvar for the corresponding analysis job",
            self._analysis_job_gsvar_file))
        ep(Endpoint("analysis_job_last_update", {
            "job_id": ParamProps(ParamCategory.GET_URL_PARAM, True, "Analysis job id"),
        }, "GET", "application/json", AuthType.USER_TOKEN,
            "Date and time (in seconds) of the last log file modification for the specific analysis job",
            self._analysis_job_last_update))
        ep(Endpoint("analysis_job_log", {
            "job_id": ParamProps(ParamCategory.GET_URL_PARAM, True, "Analysis job id"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "GET", "application/json", AuthType.USER_TOKEN,
            "Analysis job log file", self._analysis_job_log))
        ep(Endpoint("project_file", {
            "ps_url_id": ParamProps(ParamCategory.GET_URL_PARAM, True, "GSvar file URL id"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "PUT", "text/plain", AuthType.USER_TOKEN,
            "Update an existing project file (GSvar file)", self._project_file))
        ep(Endpoint("ps_regions", {
            "sys_id": ParamProps(ParamCategory.GET_URL_PARAM, True, "Processing system id"),
        }, "GET", "text/plain", AuthType.USER_TOKEN,
            "Processing system regions", self._ps_regions))
        ep(Endpoint("ps_genes", {
            "sys_id": ParamProps(ParamCategory.GET_URL_PARAM, True, "Processing system id"),
        }, "GET", "text/plain", AuthType.USER_TOKEN,
            "Processing system genes", self._ps_genes))
        ep(Endpoint("secondary_analyses", {
            "ps_name": ParamProps(ParamCategory.GET_URL_PARAM, True, "Processed sample name"),
            "type": ParamProps(ParamCategory.GET_URL_PARAM, True, "Analysis type"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "GET", "application/json", AuthType.USER_TOKEN,
            "Secondary analyses list", self._secondary_analyses))
        ep(Endpoint("project_folder", {
            "id": ParamProps(ParamCategory.GET_URL_PARAM, True, "Project id"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "GET", "application/json", AuthType.USER_TOKEN,
            "Reads the project folder on the server and checks if there is "
            "any data in every processed sample folder", self._project_folder))
        ep(Endpoint("project_folder_settings", {
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "GET", "application/json", AuthType.USER_TOKEN,
            "Reads the server configuration and returns a list of locations "
            "for all existing project types", self._project_folder_settings))
        ep(Endpoint("current_client", {}, "GET", "application/json", AuthType.NONE,
                    "Information about the latest available desktop client application",
                    self._current_client))
        ep(Endpoint("notification", {}, "GET", "application/json", AuthType.NONE,
                    "Information for the users of the desktop client",
                    self._notification))
        ep(Endpoint("low_coverage_regions", {
            "roi": ParamProps(ParamCategory.POST_URL_ENCODED, True, "Target region"),
            "bam_url_id": ParamProps(ParamCategory.POST_URL_ENCODED, True, "BAM URL id"),
            "cutoff": ParamProps(ParamCategory.POST_URL_ENCODED, True, "Coverage cutoff"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "POST", "text/plain", AuthType.USER_TOKEN,
            "Calculates low coverage regions", self._low_coverage_regions))
        ep(Endpoint("avg_coverage_gaps", {
            "roi": ParamProps(ParamCategory.POST_URL_ENCODED, True, "Gap region"),
            "bam_url_id": ParamProps(ParamCategory.POST_URL_ENCODED, True, "BAM URL id"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "POST", "text/plain", AuthType.USER_TOKEN,
            "Calculates average coverage for gaps", self._avg_coverage_gaps))
        ep(Endpoint("target_region_read_depth", {
            "roi": ParamProps(ParamCategory.POST_URL_ENCODED, True, "Target region"),
            "bam_url_id": ParamProps(ParamCategory.POST_URL_ENCODED, True, "BAM URL id"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "POST", "text/plain", AuthType.USER_TOKEN,
            "Calculates target region read depth used in germline report",
            self._target_region_read_depth))
        ep(Endpoint("multi_sample_analysis_info", {
            "analyses": ParamProps(ParamCategory.POST_URL_ENCODED, True, "Analysis file URLs"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "POST", "application/json", AuthType.USER_TOKEN,
            "Creates a list of analysis names for multi-samples",
            self._multi_sample_analysis_info))
        ep(Endpoint("db_token", {
            "token": ParamProps(ParamCategory.POST_URL_ENCODED, True, "Secure token"),
        }, "POST", "text/plain", AuthType.USER_TOKEN,
            "Secure token generation for accessing the database credentials",
            self._db_token))
        ep(Endpoint("secret", {
            "token": ParamProps(ParamCategory.ANY, True, "Secure token"),
        }, "GET", "text/plain", AuthType.USER_TOKEN,
            "Random secret of the current session", self._secret))
        ep(Endpoint("ngsd_credentials", {
            "dbtoken": ParamProps(ParamCategory.POST_URL_ENCODED, True, "DB token"),
            "secret": ParamProps(ParamCategory.POST_URL_ENCODED, False, "Session secret"),
        }, "POST", "application/json", AuthType.DB_TOKEN,
            "NGSD credentials for the GSvar desktop client", self._ngsd_credentials))
        ep(Endpoint("genlab_credentials", {
            "dbtoken": ParamProps(ParamCategory.POST_URL_ENCODED, True, "DB token"),
            "secret": ParamProps(ParamCategory.POST_URL_ENCODED, False, "Session secret"),
        }, "POST", "application/json", AuthType.DB_TOKEN,
            "Genlab credentials for the GSvar desktop client", self._genlab_credentials))
        ep(Endpoint("rna_fusion_pics", {
            "rna_id": ParamProps(ParamCategory.GET_URL_PARAM, True, "RNA sample name"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "GET", "application/json", AuthType.USER_TOKEN,
            "List RNA fusion plots needed for a report", self._rna_fusion_pics))
        ep(Endpoint("rna_expression_plots", {
            "rna_id": ParamProps(ParamCategory.GET_URL_PARAM, True, "RNA sample name"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "GET", "application/json", AuthType.USER_TOKEN,
            "List RNA expression plots needed for a report", self._rna_expression_plots))
        ep(Endpoint("variant_annotation", {
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "POST", "text/plain", AuthType.USER_TOKEN,
            "Variant annotation of an uploaded VCF", self._variant_annotation))
        ep(Endpoint("blat_search", {
            "sequence": ParamProps(ParamCategory.GET_URL_PARAM, True, "Sequence"),
            "token": ParamProps(ParamCategory.ANY, False, "Secure token"),
        }, "GET", "text/plain", AuthType.USER_TOKEN,
            "BLAT search for a given sequence and genome", self._blat_search))

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

    # ---- round-3 endpoints (ServerController.cpp handlers) ----
    def _temp_url(self, path: str) -> str:
        """Absolute-path file -> temporary /temp/<id>/<name> URL."""
        entity = self.urls.add_file(path)
        return f"temp/{entity.string_id}/{entity.filename}"

    def _file_location(self, req):
        """locateFileByType (ServerController.cpp:260-...)."""
        from ..ngsd.file_location import FileLocationProviderLocal
        ps_url_id = req["params"].get("ps_url_id", "").strip()
        entity = self.urls.get(ps_url_id)
        if entity is None or not os.path.exists(entity.filename_with_path):
            return 404, "text/plain", b"Processed sample file does not exist"
        multiple = req["params"].get("multiple_files", "1").strip() != "0"
        return_if_missing = req["params"].get("return_if_missing", "1") != "0"
        locus = req["params"].get("locus", "")
        provider = FileLocationProviderLocal(entity.filename_with_path, self.ngsd)
        try:
            locations = provider.locate(req["params"].get("type", ""),
                                        multiple, return_if_missing, locus)
        except ValueError as exc:
            return 400, "text/plain", str(exc).encode()
        out = []
        for loc in locations:
            obj = loc.to_json_obj()
            obj["filename"] = self._temp_url(loc.filename)
            out.append(obj)
        return 200, "application/json", json.dumps(out).encode()

    def _assets(self, req):
        """serveResourceAsset ('assets' endpoint) — test assets from
        <server_root>/assets."""
        rel = req["path_params"]
        root = os.path.join(self.server_root, "assets")
        target = os.path.abspath(os.path.join(root, *rel))
        if not target.startswith(root + os.sep):
            return 403, "text/plain", b"Access denied"
        if not os.path.isfile(target):
            return 404, "text/plain", b"File not found"
        return 200, _guess_type(target), FilePayload(target)

    def _genome(self, req):
        """serveStaticServerGenomes — genomes live in <server_root>/genomes."""
        rel = req["path_params"]
        root = os.path.join(self.server_root, "genomes")
        target = os.path.abspath(os.path.join(root, *rel))
        if not target.startswith(root + os.sep):
            return 403, "text/plain", b"Access denied"
        if not os.path.isfile(target):
            return 404, "text/plain", b"File not found"
        return 200, _guess_type(target), FilePayload(target)

    def _analysis_job_gsvar_file(self, req):
        """getAnalysisJobGSvarFile (ServerController.cpp:737-780)."""
        if self.ngsd is None:
            return 501, "text/plain", b"NGSD is not available"
        job_id = int(req["params"].get("job_id", "0"))
        try:
            job = self.ngsd.analysis_info(job_id, True)
            ps_name = self.ngsd.processed_sample_name(
                self.ngsd.processed_sample_id(job["samples"][0]["name"]))
            path = self.ngsd.analysis_job_gsvar_file(job_id)
        except Exception as exc:
            return 500, "text/plain", str(exc).encode()
        body = json.dumps({
            "id": ps_name,
            "type": "GSVAR",
            "filename": self._temp_url(path),
            "exists": os.path.exists(path),
        }).encode()
        return 200, "application/json", body

    def _analysis_job_last_update(self, req):
        """getAnalysisJobLastUpdate (ServerController.cpp:781-822)."""
        if self.ngsd is None:
            return 501, "text/plain", b"NGSD is not available"
        job_id = int(req["params"].get("job_id", "0"))
        try:
            info = self.ngsd.analysis_job_latest_log_info(job_id)
        except Exception:
            return 404, "text/plain", b"Last update time is unknown"
        body = json.dumps({
            "latest_file": info["file_name"],
            "latest_file_with_path": info["file_name_with_path"],
            "latest_mod": str(info["last_modified"]),
            "latest_created": str(info["created"]),
        }).encode()
        return 200, "application/json", body

    def _analysis_job_log(self, req):
        """getAnalysisJobLog (ServerController.cpp:823-866)."""
        if self.ngsd is None:
            return 501, "text/plain", b"NGSD is not available"
        job_id = int(req["params"].get("job_id", "0"))
        try:
            job = self.ngsd.analysis_info(job_id, True)
            ps_name = self.ngsd.processed_sample_name(
                self.ngsd.processed_sample_id(job["samples"][0]["name"]))
            log = self.ngsd.analysis_job_latest_log_info(job_id)
        except Exception as exc:
            return 500, "text/plain", str(exc).encode()
        body = json.dumps({
            "id": ps_name,
            "type": "OTHER",
            "filename": self._temp_url(log["file_name_with_path"]),
            "exists": os.path.exists(log["file_name_with_path"]),
        }).encode()
        return 200, "application/json", body

    def _project_file(self, req):
        """saveProjectFile (ServerController.cpp:867-1008): applies per-
        variant column edits to a GSvar file atomically with backup."""
        ps_url_id = req["params"].get("ps_url_id", "")
        entity = self.urls.get(ps_url_id)
        if entity is None:
            return 404, "text/plain", (
                f"The GSvar file in {ps_url_id} could not be located".encode())
        try:
            changes = json.loads(req["body"].decode() or "[]")
        except ValueError as exc:
            return 500, "text/plain", (
                f"Changes for the GSvar file in {ps_url_id} could not be "
                f"parsed: {exc}".encode())
        path = entity.filename_with_path
        tmp = f"{path}_{ps_url_id}.tmp"
        changed = False
        with open(path, encoding="utf-8") as fin, \
                open(tmp, "w", encoding="utf-8") as fout:
            columns = []
            key_idx = {}
            for line in fin:
                line = line.rstrip("\n")
                if line.startswith("##"):
                    fout.write(line + "\n")
                    continue
                if line.startswith("#"):
                    fout.write(line + "\n")
                    columns = line.split("\t")
                    key_idx = {k: columns.index(k) for k in
                               ("#chr", "start", "end", "ref", "obs")
                               if k in columns}
                    if len(key_idx) != 5:
                        return 500, "text/plain", (
                            f"Could not identify key columns in GSvar file: "
                            f"{ps_url_id}".encode())
                    continue
                fields = line.split("\t")
                variant = (f"{fields[key_idx['#chr']]}:{fields[key_idx['start']]}"
                           f"-{fields[key_idx['end']]} {fields[key_idx['ref']]}"
                           f">{fields[key_idx['obs']]}").lower().strip()
                row_changed = False
                for change in changes:
                    if change.get("variant", "").lower().strip() != variant:
                        continue
                    column = change.get("column", "").strip()
                    if column not in columns:
                        return 500, "text/plain", (
                            f"Could not identify changed column {column} in "
                            f"GSvar file: {ps_url_id}".encode())
                    fields[columns.index(column)] = urllib.parse.quote(
                        change.get("text", ""))
                    row_changed = changed = True
                fout.write(("\t".join(fields) if row_changed else line) + "\n")
        if changed:
            backup = path + ".gsvarserver.bak"
            os.replace(path, backup)
            os.replace(tmp, path)
            os.remove(backup)
            return 200, "text/plain", b"Project file has been changed"
        os.remove(tmp)
        return 200, "text/plain", b"No changes to the file detected"

    def _ps_regions(self, req):
        """getProcessingSystemRegions (ServerController.cpp:1501-1526)."""
        if self.ngsd is None:
            return 501, "text/plain", b"NGSD is not available"
        try:
            path = self.ngsd.processing_system_regions_file_path(
                int(req["params"].get("sys_id", "0")))
        except Exception as exc:
            return 500, "text/plain", str(exc).encode()
        if not path or not os.path.exists(path):
            return 404, "text/plain", b"Processing system regions file has not been found"
        return 200, "text/plain", FilePayload(path)

    def _ps_genes(self, req):
        """getProcessingSystemGenes (ServerController.cpp:1528-1553)."""
        if self.ngsd is None:
            return 501, "text/plain", b"NGSD is not available"
        try:
            path = self.ngsd.processing_system_genes_file_path(
                int(req["params"].get("sys_id", "0")))
        except Exception as exc:
            return 500, "text/plain", str(exc).encode()
        if not path or not os.path.exists(path):
            return 404, "text/plain", b"Processing system genes file has not been found"
        return 200, "text/plain", FilePayload(path)

    def _secondary_analyses(self, req):
        """getSecondaryAnalyses (ServerController.cpp:1555-1596)."""
        if self.ngsd is None:
            return 501, "text/plain", b"NGSD is not available"
        try:
            files = self.ngsd.secondary_analyses(
                req["params"].get("ps_name", ""),
                urllib.parse.unquote(req["params"].get("type", "")))
        except Exception as exc:
            return 500, "text/plain", (
                f"Could not get secondary analyses: {exc}".encode())
        urls = [self._temp_url(f) for f in files if os.path.exists(f)]
        return 200, "application/json", json.dumps(urls).encode()

    def _require_admin(self, req):
        """401 response tuple unless the session user has the admin role
        (checkProjectFolder/getProjectFolderSettings access rule)."""
        session = self.sessions.get(req["token"])
        if session is None:
            return 401, "text/plain", b"You are not logged in"
        if self.ngsd is None:
            return 501, "text/plain", b"NGSD is not available"
        if self.ngsd.get_user_role(session.user_id) != "admin":
            return 401, "text/plain", b"You do not have permissions to change projects!"
        return None

    def _project_folder(self, req):
        """checkProjectFolder (ServerController.cpp:624-686)."""
        err = self._require_admin(req)
        if err:
            return err
        project_id = int(req["params"].get("id", "0"))
        safe_to_change = True
        messages = []
        try:
            ps_ids = self.ngsd.get_values(
                "SELECT ps.id FROM processed_sample ps INNER JOIN project p "
                "ON ps.project_id=p.id WHERE ps.project_id=?",
                params=(project_id,))
            non_empty = []
            for ps_id in ps_ids:
                folder = self.ngsd.processed_sample_path(ps_id, "SAMPLE_FOLDER")
                if os.path.isdir(folder) and os.listdir(folder):
                    safe_to_change = False
                    non_empty.append(self.ngsd.processed_sample_name(ps_id))
            if non_empty:
                messages.append("The following processed samples contain some "
                                "files: " + ", ".join(non_empty) + ".")
        except Exception as exc:
            return 404, "text/plain", str(exc).encode()
        body = json.dumps({"project_id": project_id,
                           "safe_to_change": safe_to_change,
                           "message": " ".join(messages)}).encode()
        return 200, "application/json", body

    def _project_folder_settings(self, req):
        """getProjectFolderSettings (ServerController.cpp:688-735)."""
        err = self._require_admin(req)
        if err:
            return err
        try:
            types = self.ngsd.get_enum("project", "type")
            out = [{"type": t, "path": self.ngsd.project_folder(t)}
                   for t in types]
        except Exception as exc:
            return 404, "text/plain", str(exc).encode()
        return 200, "application/json", json.dumps(out).encode()

    def _current_client(self, req):
        """getCurrentClientInfo — version info from settings."""
        from ..core import settings
        body = json.dumps({
            "version": settings.string("client_version", True),
            "message": settings.string("client_message", True),
            "date": int(self._start_time),
        }).encode()
        return 200, "application/json", body

    def _notification(self, req):
        """getCurrentNotification — admin broadcast from settings."""
        from ..core import settings
        body = json.dumps({
            "id": settings.string("notification_id", True),
            "message": settings.string("notification_message", True),
        }).encode()
        return 200, "application/json", body

    @staticmethod
    def _bed_from_text(text: str):
        from ..core.chromosome import Chromosome
        from ..core.intervals import BedFile, BedLine
        bed = BedFile()
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith(("#", "track", "browser")):
                continue
            f = line.split("\t")
            bed.append(BedLine(Chromosome(f[0]), int(f[1]) + 1, int(f[2]),
                               [a.encode() for a in f[3:]]))
        return bed

    def _resolve_bam(self, req):
        bam_url_id = req["form"].get("bam_url_id", "")
        entity = self.urls.get(bam_url_id)
        if entity is None or not os.path.exists(entity.filename_with_path):
            name = entity.filename_with_path if entity else bam_url_id
            return None, (404, "text/plain",
                          f"BAM file does not exist: {name}".encode())
        return entity.filename_with_path, None

    def _low_coverage_regions(self, req):
        """calculateLowCoverage (ServerController.cpp:1070-1106)."""
        from ..qc.coverage import low_or_high_coverage
        bam, err = self._resolve_bam(req)
        if err:
            return err
        roi = self._bed_from_text(req["form"].get("roi", ""))
        roi.merge()
        cutoff = int(req["form"].get("cutoff", "0"))
        low = low_or_high_coverage(roi, bam, cutoff, min_mapq=1, min_baseq=0,
                                   threads=1, is_high=False)
        return 200, "text/plain", low.to_text().encode()

    def _avg_coverage_gaps(self, req):
        """calculateAvgCoverage (ServerController.cpp:1108-1140)."""
        from ..qc.coverage import avg_coverage
        bam, err = self._resolve_bam(req)
        if err:
            return err
        roi = self._bed_from_text(req["form"].get("roi", ""))
        avg_coverage(roi, bam, min_mapq=1, threads=1, decimals=2)
        return 200, "text/plain", roi.to_text().encode()

    def _target_region_read_depth(self, req):
        """calculateTargetRegionReadDepth (ServerController.cpp:1141-1178):
        runs the MappingQC engine and returns QC:2000025."""
        from ..core import settings
        from ..qc.mapping_stats import mapping_roi
        bam, err = self._resolve_bam(req)
        if err:
            return err
        ref_file = settings.string("reference_genome", True)
        if not ref_file or not os.path.exists(ref_file):
            return 501, "text/plain", b"Reference genome is not configured"
        roi = self._bed_from_text(req["form"].get("roi", ""))
        roi.merge()
        stats = mapping_roi(roi, bam, ref_file)
        for value in stats:
            if value.accession == "QC:2000025":
                return 200, "text/plain", value.to_string().encode()
        return 500, "text/plain", b"Could not calculate target region read depth"

    def _multi_sample_analysis_info(self, req):
        """getMultiSampleAnalysisInfo (ServerController.cpp:1180-1242)."""
        from ..ngsd.file_location import _gsvar_header_info
        try:
            analyses = json.loads(urllib.parse.unquote(
                req["form"].get("analyses", "")))
            assert isinstance(analyses, list)
        except Exception:
            return 500, "text/plain", b"Could not parse the server response into JSON"
        out = []
        for file_url in analyses:
            parts = str(file_url).split("/")
            if len(parts) < 2:
                continue
            entity = self.urls.get(parts[-2])
            if entity is None:
                continue
            _type, samples = _gsvar_header_info(entity.filename_with_path)
            names, ids = [], []
            for name, _props in samples:
                names.append(name)
                ps_id = ""
                if self.ngsd is not None:
                    try:
                        ps_id = self.ngsd.processed_sample_id(name, False)
                    except Exception as exc:
                        return 500, "text/plain", str(exc).encode()
                ids.append(ps_id)
            out.append({
                "analysis_file": file_url,
                "analysis_name": os.path.basename(
                    entity.filename_with_path).rsplit(".", 1)[0],
                "ps_sample_name_list": names,
                "ps_sample_id_list": ids,
            })
        return 200, "application/json", json.dumps(out).encode()

    def _db_token(self, req):
        """getDbToken (ServerController.cpp:1382-1401): db-only session."""
        user_session = self.sessions.get(req["form"].get("token", ""))
        if user_session is None:
            return 401, "text/plain", b"You need to log in first"
        db_session = self.sessions.create_session(
            user_session.user_id, user_session.user_login,
            user_session.user_name, is_for_db_only=True)
        return 200, "text/plain", db_session.secure_token.encode()

    def _secret(self, req):
        """getRandomSecret (ServerController.cpp:1403-1418)."""
        session = self.sessions.get(req["token"])
        if session is None:
            return 403, "text/plain", b"You are not allowed to access this information"
        return 200, "text/plain", session.random_secret.encode()

    def _ngsd_credentials(self, req):
        """getNgsdCredentials (ServerController.cpp:1420-1438)."""
        from ..core import settings
        body = json.dumps({f"ngsd_{k}": settings.string(f"ngsd_{k}", True)
                           for k in ("host", "port", "name", "user", "pass")}).encode()
        return 200, "application/json", body

    def _genlab_credentials(self, req):
        """getGenlabCredentials (ServerController.cpp:1440-1458)."""
        from ..core import settings
        cred = {"genlab_mssql": settings.string("genlab_mssql", True) in ("1", "true")}
        for k in ("host", "port", "name", "user", "pass"):
            cred[f"genlab_{k}"] = settings.string(f"genlab_{k}", True)
        return 200, "application/json", json.dumps(cred).encode()

    def _rna_pics(self, req, path_type: str):
        if self.ngsd is None:
            return 501, "text/plain", b"NGSD is not available"
        rna_id = req["params"].get("rna_id", "")
        try:
            ps_id = self.ngsd.processed_sample_id(rna_id, False)
            if not ps_id:
                return 404, "text/plain", (
                    f"Could not find a processed sample id {rna_id}".encode())
            folder = self.ngsd.processed_sample_path(ps_id, path_type)
        except Exception as exc:
            return 500, "text/plain", str(exc).encode()
        import glob as _glob
        files = sorted(_glob.glob(os.path.join(folder, "*.png")))
        return 200, "application/json", json.dumps(
            [self._temp_url(f) for f in files]).encode()

    def _rna_fusion_pics(self, req):
        """getRnaFusionPics (ServerController.cpp:1598-1645)."""
        return self._rna_pics(req, "FUSIONS_PIC_DIR")

    def _rna_expression_plots(self, req):
        """getRnaExpressionPlots (ServerController.cpp:1647-1694)."""
        import glob as _glob
        if self.ngsd is None:
            return 501, "text/plain", b"NGSD is not available"
        rna_id = req["params"].get("rna_id", "")
        try:
            ps_id = self.ngsd.processed_sample_id(rna_id, False)
            if not ps_id:
                return 404, "text/plain", (
                    f"Could not find a processed sample id {rna_id}".encode())
            folder = self.ngsd.processed_sample_path(ps_id, "SAMPLE_FOLDER")
        except Exception as exc:
            return 500, "text/plain", str(exc).encode()
        files = sorted(_glob.glob(os.path.join(folder, f"{rna_id}_expr.*.png")))
        return 200, "application/json", json.dumps(
            [self._temp_url(f) for f in files]).encode()

    def _variant_annotation(self, req):
        """annotateVariant (ServerController.cpp:1021-1068): validates the
        uploaded VCF; annotation runs only when a pipeline is configured
        (megSAP in the reference; gated here via the 'megsap_root' setting)."""
        import io as _io
        import tempfile as _tempfile

        from ..core import settings
        from ..io.vcf_check import vcf_is_valid
        ref_file = settings.string("reference_genome", True)
        if not ref_file or not os.path.exists(ref_file):
            return 501, "text/plain", b"Reference genome is not configured"
        with _tempfile.NamedTemporaryFile("wb", suffix=".vcf", delete=False) as fh:
            fh.write(req["body"])
            input_vcf = fh.name
        try:
            sink = _io.StringIO()
            if not vcf_is_valid(input_vcf, ref_file, sink):
                return 500, "text/plain", (
                    "Invalid input VCF data: " + sink.getvalue()).encode()
        finally:
            os.unlink(input_vcf)
        if not settings.string("megsap_root", True):
            return 501, "text/plain", b"Annotation pipeline is not configured"
        return 501, "text/plain", b"Annotation pipeline execution is not supported"

    def _blat_search(self, req):
        """performBlatSearch (ServerController.cpp:1712-1735): requires the
        external BLAT-like mapper from the pipeline — gated on settings."""
        from ..core import settings
        if not settings.string("megsap_root", True):
            return 501, "text/plain", b"BLAT search pipeline is not configured"
        return 501, "text/plain", b"BLAT search execution is not supported"


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
            elif endpoint.auth_type == AuthType.DB_TOKEN:
                db_token = params.get("dbtoken") or form.get("dbtoken") or token
                session = server.sessions.get(db_token)
                if (session is None or session.is_expired(server.sessions.valid_period)
                        or not session.is_for_db_only):
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

        def do_PUT(self):
            self._dispatch("PUT")

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
