"""Local + HTTP(S) file abstraction.

Behavioral reference: ngs-bits cppCORE ``VersatileFile`` (local files and
remote files served over HTTP(S), e.g. by GSvarServer; byte-range reads,
size/exists queries — cppCORE-TEST/VersatileFile_Test.cpp). Readers accept
either a local path or an http(s):// URL transparently.

HTTP access uses urllib with Range headers so BAM/BGZF random access works
against any range-capable server (including ngsbits_tpu.rest.GSvarServer).
"""

from __future__ import annotations

import io
import os
import urllib.request


def is_remote(path: str) -> bool:
    return str(path).startswith(("http://", "https://"))


class VersatileFile:
    """Seekable read-only binary file over a local path or HTTP(S) URL."""

    def __init__(self, path: str, timeout: float = 30.0):
        self.path = str(path)
        self.timeout = timeout
        self._pos = 0
        self._size: int | None = None
        if not is_remote(self.path):
            self._fh = open(self.path, "rb")
        else:
            self._fh = None

    # ---- queries ----
    def exists(self) -> bool:
        if self._fh is not None:
            return True
        try:
            req = urllib.request.Request(self.path, method="HEAD")
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status < 400
        except Exception:
            return False

    def size(self) -> int:
        if self._fh is not None:
            return os.fstat(self._fh.fileno()).st_size
        if self._size is None:
            req = urllib.request.Request(self.path, method="HEAD")
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                self._size = int(resp.headers.get("Content-Length", -1))
        return self._size

    # ---- stream API ----
    def tell(self) -> int:
        return self._fh.tell() if self._fh is not None else self._pos

    def seek(self, pos: int, whence: int = io.SEEK_SET):
        if self._fh is not None:
            self._fh.seek(pos, whence)
            return
        if whence == io.SEEK_SET:
            self._pos = pos
        elif whence == io.SEEK_CUR:
            self._pos += pos
        else:
            self._pos = self.size() + pos

    def read(self, n: int = -1) -> bytes:
        if self._fh is not None:
            return self._fh.read() if n < 0 else self._fh.read(n)
        if n == 0:
            return b""
        headers = {}
        if n < 0:
            if self._pos > 0:
                headers["Range"] = f"bytes={self._pos}-"
        else:
            headers["Range"] = f"bytes={self._pos}-{self._pos + n - 1}"
        req = urllib.request.Request(self.path, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                data = resp.read()
                if resp.status == 200 and headers.get("Range"):
                    # server ignored the range; slice locally
                    start = self._pos
                    data = data[start:start + n] if n > 0 else data[start:]
        except urllib.error.HTTPError as exc:
            if exc.code == 416:  # past EOF
                return b""
            raise
        self._pos += len(data)
        return data

    def read_all(self) -> bytes:
        self.seek(0)
        return self.read(-1)

    def readline(self) -> bytes:
        # buffered line reads for remote text files
        chunks = []
        while True:
            chunk = self.read(4096)
            if not chunk:
                break
            nl = chunk.find(b"\n")
            if nl >= 0:
                chunks.append(chunk[:nl + 1])
                # rewind the overshoot
                self.seek(self.tell() - (len(chunk) - nl - 1))
                break
            chunks.append(chunk)
        return b"".join(chunks)

    def close(self):
        if self._fh is not None:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


_FETCH_CACHE: dict = {}


def local_path(path) -> str:
    """Return a local filesystem path for `path`.

    Local paths pass through; http(s) URLs are fetched once per process
    into a temp file (the reference's htslib streams ranges instead; for
    batch CLI tools a one-shot fetch has the same semantics — the
    random-access BAI/tabix paths then work against the local copy).
    """
    p = str(path)
    if not is_remote(p):
        return p
    cached = _FETCH_CACHE.get(p)
    if cached is not None:
        return cached
    import tempfile
    base_url, sep, query = p.partition("?")
    suffix = os.path.splitext(base_url)[1] or ".bin"
    fd, tmp = tempfile.mkstemp(prefix="ngsbits_remote_", suffix=suffix)
    try:
        with os.fdopen(fd, "wb") as out, \
                urllib.request.urlopen(p, timeout=60.0) as resp:
            expected = resp.headers.get("Content-Length")
            got = 0
            while True:
                chunk = resp.read(4 << 20)
                if not chunk:
                    break
                got += len(chunk)
                out.write(chunk)
        # an early connection close surfaces as a short read, not an
        # exception — never cache a truncated download
        if expected is not None and got != int(expected):
            raise IOError(
                f"truncated download of '{p}': {got} of {expected} bytes")
    except Exception:
        os.unlink(tmp)
        raise
    _FETCH_CACHE[p] = tmp
    import atexit
    atexit.register(lambda: os.path.exists(tmp) and os.unlink(tmp))
    # fetch the matching index sibling when the file type has one (BAI /
    # tabix random access against the local copy); query strings keep
    # their position: f.bam?tok -> f.bam.bai?tok
    if base_url.endswith(".bam"):
        exts = (".bai",)
    elif base_url.endswith((".gz", ".bgz")):
        exts = (".tbi", ".csi")
    else:
        exts = ()
    for ext in exts:
        sib = base_url + ext + (sep + query if query else "")
        try:
            with urllib.request.urlopen(sib, timeout=30.0) as resp:
                data = resp.read()
            with open(tmp + ext, "wb") as fh:
                fh.write(data)
            atexit.register(lambda t=tmp + ext: os.path.exists(t) and os.unlink(t))
        except Exception:  # noqa: BLE001 — index is optional
            pass
    return tmp
