"""Build and drive the reference decoder (read-only at /root/reference) as a
golden oracle for bit-exactness tests.  Build artifacts go to /tmp (never into
the reference tree).  This module never copies reference code — it compiles it
out-of-tree and links tools/dump_yuv.c (our own client of the public API).
"""

from __future__ import annotations

import os
import subprocess
import hashlib
from dataclasses import dataclass

REF = "/root/reference"
BUILD = "/tmp/edge264_oracle"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, **kw):
    subprocess.run(cmd, check=True, **kw)


@dataclass
class RefOracle:
    build_dir: str

    @classmethod
    def build(cls) -> "RefOracle":
        os.makedirs(BUILD, exist_ok=True)
        lib = os.path.join(BUILD, "libedge264.so.1")
        dump = os.path.join(BUILD, "dump_yuv")
        test = os.path.join(BUILD, "edge264_test")
        base = ["-march=native", "-std=gnu11", "-O2", "-DNDEBUG",
                "-flax-vector-conversions", "-Wno-override-init", "-pthread"]
        if not os.path.exists(lib):
            _run(["cc", f"{REF}/src/edge264.c", "-c", *base, "-fPIC",
                  "-DHAS_LOGS", "-o", f"{BUILD}/edge264.o"])
            _run(["cc", f"{REF}/src/edge264_headers.c", "-c", *base, "-fPIC",
                  "-DLOGS", "-DADD_VARIANT(f)=f##_log",
                  "-o", f"{BUILD}/edge264_headers_log.o"])
            _run(["cc", f"{BUILD}/edge264.o", f"{BUILD}/edge264_headers_log.o",
                  "-shared", "-Wl,-soname,libedge264.so.1", "-o", lib])
        if not os.path.exists(dump) or os.path.getmtime(dump) < os.path.getmtime(
                os.path.join(REPO, "tools/dump_yuv.c")):
            _run(["cc", os.path.join(REPO, "tools/dump_yuv.c"), *base,
                  f"-I{REF}", "-Wl,-rpath," + BUILD, lib, "-o", dump])
        if not os.path.exists(test):
            _run(["cc", f"{REF}/src/edge264_test.c", *base,
                  "-Wl,-rpath," + BUILD, lib, "-o", test])
        return cls(BUILD)

    # ---- oracle outputs -------------------------------------------------

    def _cache_path(self, stream: bytes, tag: str) -> str:
        h = hashlib.sha256(stream).hexdigest()[:24]
        return os.path.join(BUILD, f"cache_{h}.{tag}")

    def decode_yuv(self, stream: bytes):
        """Decode an Annex-B stream; return (frames_meta, yuv_bytes, yuv2_bytes).

        frames_meta is a list of (frame_id, wY, hY, wC, hC)."""
        inp = self._cache_path(stream, "264")
        out = self._cache_path(stream, "yuv")
        out2 = self._cache_path(stream, "yuv1")
        meta = self._cache_path(stream, "meta")
        if not os.path.exists(meta):
            with open(inp, "wb") as f:
                f.write(stream)
            r = subprocess.run([os.path.join(self.build_dir, "dump_yuv"),
                                inp, out, out2],
                               capture_output=True, text=True, timeout=600)
            if r.returncode != 0:
                raise RuntimeError(f"dump_yuv failed: {r.stderr}")
            with open(meta, "w") as f:
                f.write(r.stdout)
        frames = []
        for line in open(meta):
            parts = line.split()
            if parts and parts[0] == "frame":
                fid = int(parts[1])
                wy, hy = map(int, parts[2].split("x"))
                wc, hc = map(int, parts[3].split("x"))
                frames.append((fid, wy, hy, wc, hc))
        yuv = open(out, "rb").read()
        yuv2 = open(out2, "rb").read() if os.path.exists(out2) else b""
        return frames, yuv, yuv2

    def trace(self, stream: bytes, mbs: bool = True) -> str:
        """Run the reference edge264_test with -v/-V; return the YAML trace."""
        tag = "traceV" if mbs else "trace"
        cached = self._cache_path(stream, tag)
        if not os.path.exists(cached):
            inp = self._cache_path(stream, "264")
            with open(inp, "wb") as f:
                f.write(stream)
            flag = "-V" if mbs else "-v"
            subprocess.run([os.path.join(self.build_dir, "edge264_test"),
                            inp, "-y", flag],
                           cwd=self.build_dir, capture_output=True, timeout=600)
            os.replace(os.path.join(self.build_dir, "trace.yaml"), cached)
        return open(cached).read()
