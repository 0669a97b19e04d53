"""File-object API: ``bz2tpu.open()`` / ``BZ2File`` (stdlib ``bz2`` parity).

The reference is CLI-only (reference app.cpp:69-176); the library surface
here mirrors the stdlib so existing ``bz2.open``/``bz2.BZ2File`` call
sites can switch imports and get the TPU pipeline:

  * write modes stream through the push-style ``StreamCompressor``
    (bounded memory; blocks leave for the device in batches);
  * read modes stream through ``StreamDecompressor`` (bounded memory,
    native C block decode) and read concatenated multi-member files
    transparently, exactly like stdlib ``BZ2File``;
  * append mode starts a fresh bzip2 stream after the existing bytes —
    a standard multi-member file that stock bzip2 and stdlib decode.
"""

from __future__ import annotations

import io
import os

from bz2tpu.format import constants as C

_READ_CHUNK = 1 << 20


class BZ2File(io.BufferedIOBase):
    """Stdlib-``bz2.BZ2File``-compatible file object over the TPU codec.

    Args:
      filename: path, or an object with read()/write() (then closefp=False).
      mode: "r"/"rb" read, "w"/"wb" write, "x"/"xb" exclusive create,
        "a"/"ab" append (a new stream member).
      level: block-size level 1..9 (write modes; stdlib calls this
        ``compresslevel``, accepted as an alias).
      parallel: blocks per device batch (write modes).
    """

    def __init__(self, filename, mode: str = "r", *, level: int = C.DEFAULT_LEVEL,
                 compresslevel: int | None = None, parallel: int | None = None):
        if compresslevel is not None:
            level = compresslevel
        mode = mode.replace("b", "") or "r"
        if mode not in ("r", "w", "x", "a"):
            raise ValueError(f"invalid mode: {mode!r}")
        self._writing = mode != "r"
        self._closefp = False
        if hasattr(filename, "read") or hasattr(filename, "write"):
            self._fp = filename
        else:
            self._fp = open(os.fspath(filename), mode + "b")
            self._closefp = True
        self._pos = 0
        if self._writing:
            from bz2tpu.runtime.stream import StreamCompressor

            self._sc = StreamCompressor(self._fp, level=level, parallel=parallel)
        else:
            from bz2tpu.runtime.decompressor import StreamDecompressor

            self._make_dec = StreamDecompressor
            self._dec = StreamDecompressor()
            self._outbuf = bytearray()
            self._raw_eof = False
            self._fed = False  # current member has received bytes

    # -- io plumbing -------------------------------------------------------

    def readable(self) -> bool:
        return not self._writing

    def writable(self) -> bool:
        return self._writing

    def seekable(self) -> bool:
        return False

    def tell(self) -> int:
        return self._pos

    def close(self) -> None:
        if self.closed:
            return
        try:
            if self._writing:
                self._sc.close()
        finally:
            fp, self._fp = self._fp, None
            if self._closefp:
                fp.close()
            super().close()

    # -- write path ---------------------------------------------------------

    def write(self, data) -> int:
        if not self._writing:
            raise io.UnsupportedOperation("file not open for writing")
        if self.closed:
            raise ValueError("I/O operation on closed file")
        b = bytes(data)
        self._sc.write(b)
        self._pos += len(b)
        return len(b)

    def flush(self) -> None:
        if self._fp is not None and hasattr(self._fp, "flush"):
            self._fp.flush()

    # -- read path ----------------------------------------------------------

    def _fill(self) -> bool:
        """Decode more output into the buffer; False at end of data.

        Stdlib-BZ2File trailing-data contract (verified against CPython):
        concatenated members decode transparently, non-magic trailing
        bytes are silently ignored, a TRUNCATED "BZh<1-9>" magic raises
        EOFError, and a member cut mid-stream raises EOFError.
        """
        while True:
            if self._dec.eof:
                tail = self._dec.unused_data
                while len(tail) < 4 and not self._raw_eof:
                    more = self._fp.read(_READ_CHUNK)
                    if not more:
                        self._raw_eof = True
                        break
                    tail += more
                if not tail:
                    return False
                k = min(len(tail), 3)
                magic_prefix = tail[:k] == b"BZh"[:k] and (
                    len(tail) < 4 or ord("1") <= tail[3] <= ord("9")
                )
                if not magic_prefix:
                    return False  # stdlib: non-magic trailing data ignored
                if len(tail) < 4:
                    raise EOFError(
                        "Compressed file ended before the end-of-stream "
                        "marker was reached"
                    )
                self._dec = self._make_dec()
                self._fed = True
                got = self._dec.decompress(tail)
                if got:
                    self._outbuf += got
                    return True
                continue
            chunk = self._fp.read(_READ_CHUNK)
            if not chunk:
                self._raw_eof = True
                if self._fed:
                    raise EOFError(
                        "Compressed file ended before the end-of-stream "
                        "marker was reached"
                    )
                return False
            self._fed = True
            got = self._dec.decompress(chunk)
            if got:
                self._outbuf += got
                return True

    def read(self, size: int = -1) -> bytes:
        if self._writing:
            raise io.UnsupportedOperation("file not open for reading")
        if self.closed:
            raise ValueError("I/O operation on closed file")
        if size is None or size < 0:
            while self._fill():
                pass
            out = bytes(self._outbuf)
            self._outbuf.clear()
        else:
            while len(self._outbuf) < size and self._fill():
                pass
            out = bytes(self._outbuf[:size])
            del self._outbuf[:size]
        self._pos += len(out)
        return out

    def read1(self, size: int = -1) -> bytes:
        if size == 0:
            return b""
        if not self._outbuf:
            self._fill()
        take = len(self._outbuf) if size is None or size < 0 else size
        out = bytes(self._outbuf[:take])
        del self._outbuf[:take]
        self._pos += len(out)
        return out

    def peek(self, n: int = 0) -> bytes:
        if not self._outbuf:
            self._fill()
        return bytes(self._outbuf)


def bz2_open(filename, mode: str = "rb", *, level: int = C.DEFAULT_LEVEL,
             compresslevel: int | None = None, parallel: int | None = None,
             encoding=None, errors=None, newline=None):
    """``bz2.open`` parity: binary or text mode over :class:`BZ2File`."""
    if "t" in mode:
        if "b" in mode:
            raise ValueError(f"Invalid mode: {mode!r}")
        binary = BZ2File(filename, mode.replace("t", ""), level=level,
                         compresslevel=compresslevel, parallel=parallel)
        return io.TextIOWrapper(binary, encoding, errors, newline)
    if encoding or errors or newline:
        raise ValueError("Argument 'encoding', 'errors', or 'newline' "
                         "not supported in binary mode")
    return BZ2File(filename, mode, level=level,
                   compresslevel=compresslevel, parallel=parallel)
