"""Binary stdout/stdin access that degrades gracefully.

The reference tools write binary output to stdout when no ``-out`` is given
(``ToolBase`` stdout default, reference: ``src/cppCORE`` / e.g.
``FastqToFasta``).  In Python, ``sys.stdout.buffer`` only exists on real
``io.TextIOWrapper`` streams — under in-process invocation with a redirected
``sys.stdout`` (test harnesses, notebooks, embedding apps) it raises
``AttributeError`` even on code paths that never touch stdout.  These
helpers are lazy and fall back to an encoding adapter with a *stable
identity* per wrapped stream, so ``fh is not stdout_binary()`` close-guards
keep working.
"""

from __future__ import annotations

import sys


class _TextBinaryAdapter:
    """Minimal binary file-object facade over a text stream.

    Text-only by design: the fallback exists for redirected text streams
    (test harnesses, notebooks), where binary payloads (gzip/BGZF) cannot
    round-trip.  ``write`` therefore fails loudly on non-UTF-8 bytes
    instead of silently corrupting output.
    """

    def __init__(self, text_stream):
        self._ts = text_stream

    def write(self, data: bytes) -> int:
        try:
            text = data.decode("utf-8")
        except UnicodeDecodeError as exc:
            raise ValueError(
                "binary (non-UTF-8) write to a redirected text stdout; "
                "pass an explicit output file for binary output"
            ) from exc
        self._ts.write(text)
        return len(data)

    def flush(self):
        self._ts.flush()

    def close(self):  # never close the underlying stdout/stderr
        self.flush()

    def read(self, n: int = -1) -> bytes:
        return self._ts.read(n).encode("utf-8")

    def readline(self, limit: int = -1) -> bytes:
        return self._ts.readline(limit).encode("utf-8")

    def __iter__(self):
        for line in self._ts:
            yield line.encode("utf-8")


def _binary(stream, attr: str):
    buf = getattr(stream, "buffer", None)
    if buf is not None:
        return buf
    ad = getattr(stream, attr, None)
    if ad is None:
        ad = _TextBinaryAdapter(stream)
        try:
            setattr(stream, attr, ad)
        except Exception:
            pass
    return ad


def stdout_binary():
    """Binary view of the current ``sys.stdout`` (stable identity)."""
    return _binary(sys.stdout, "_ngsbits_binary_adapter")


def stdin_binary():
    """Binary view of the current ``sys.stdin`` (stable identity)."""
    return _binary(sys.stdin, "_ngsbits_binary_adapter")
