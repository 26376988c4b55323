"""Page-cache readahead for cold rigs.

The sweep builders read the reference FASTA (and donor VCF) with random
positioned reads (os.pread). On a freshly booted machine none of those blocks
are in the OS page cache, and the random-read penalty was measured as a 13%
end-to-end regression on the genome-wide sweep (host builds 196 -> 338
ms/gene, NOTES.md round-2 continuation). One cheap sequential pass converts
that into streaming-read bandwidth and runs in the background while the model
loads/compiles, so sweeps start against a warm cache.

No reference counterpart (the reference leaves this to the OS); TPU-native
motivation: the device rate (~150 ms/gene) leaves no room for host stalls.
"""

from __future__ import annotations

import os
import threading

_BLOCK = 1 << 22  # 4 MiB sequential reads


def warm_page_cache(
    paths, background: bool = True, block: int = _BLOCK
) -> threading.Thread | None:
    """Sequentially read ``paths`` to populate the OS page cache.

    posix_fadvise(WILLNEED) alone is advisory (and a no-op on some kernels
    for large spans), so the pass actually reads the bytes. Missing paths
    and IO errors are ignored; set VFX_NO_READAHEAD=1 to disable entirely.
    With ``background=True`` returns the started daemon thread.
    """
    if os.environ.get("VFX_NO_READAHEAD") == "1":
        return None
    paths = [str(p) for p in paths if p]

    def _warm():
        for p in paths:
            try:
                fd = os.open(p, os.O_RDONLY)
            except OSError:
                continue
            try:
                size = os.fstat(fd).st_size
                try:
                    os.posix_fadvise(fd, 0, size, os.POSIX_FADV_WILLNEED)
                except (AttributeError, OSError):
                    pass
                off = 0
                while off < size:
                    if not os.pread(fd, block, off):
                        break
                    off += block
            except OSError:
                pass
            finally:
                os.close(fd)

    if background:
        t = threading.Thread(target=_warm, daemon=True, name="vfx-readahead")
        t.start()
        return t
    _warm()
    return None
