#!/usr/bin/env python3
"""Residual coefficient level histogram for a .264 stream.

Port of misc-scripts/coeff_level_histogram.py, using the decoder's
syntax planes instead of a log: decodes the stream and histograms every
non-zero transform coefficient level."""

import collections
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import numpy as np

from edge264_tpu.core import DecoderCore, NumpyBackend


def histogram(path):
    hist = collections.Counter()

    class Cap(NumpyBackend):
        def reconstruct(self, planes, slot, store):
            for k in ("coef_y", "coef_y8", "coef_cb", "coef_cr",
                      "coef_y_dc", "coef_c_dc"):
                v = np.asarray(getattr(planes, k))
                nz = v[v != 0]
                hist.update(np.abs(nz).tolist())
            return super().reconstruct(planes, slot, store)

    from edge264_tpu.api import Decoder
    dec = Decoder(backend=Cap())
    data = open(path, "rb").read()
    from edge264_tpu.api import find_start_code
    import errno
    pos = find_start_code(data, 0) + 3
    res = 0
    while res in (0, errno.ENOBUFS, errno.ENOTSUP, errno.EBADMSG):
        end = find_start_code(data, pos)
        res = dec.decode_nal(data[pos:end] if pos < len(data) else None)
        while dec.get_frame() is not None:
            pass
        if res != errno.ENOBUFS:
            pos = end + 3
    return hist


if __name__ == "__main__":
    h = histogram(sys.argv[1])
    total = sum(h.values())
    print(f"# {total} non-zero coefficients")
    for level in sorted(h):
        bar = "#" * max(1, int(60 * h[level] / max(h.values())))
        print(f"{level:5d} {h[level]:8d} {bar}")
