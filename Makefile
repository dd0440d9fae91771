# Convenience targets (reference: edge264 Makefile; here the C++ front end
# builds itself on import, so make mostly wraps the Python workflows).

PY ?= python

.PHONY: all native check bench fuzz tsan gentests clean

all: native

native:            ## build the C++ entropy front end (libe264t.so)
	$(PY) -c "from edge264_tpu.native import build; print(build(force=True))"

check:             ## full test suite (CPU; 8-device virtual mesh)
	$(PY) -m pytest tests/ -q

bench:             ## end-to-end 1080p benchmark (one JSON line)
	$(PY) bench.py

fuzz:              ## ASan+UBSan fuzz corpus over the C++ front end
	$(PY) tools/fuzz_corpus.py

tsan:              ## ThreadSanitizer pass over the concurrent task pool
	$(PY) -c "import sys; sys.path.insert(0,'.'); \
	from tools.avcgen import *; \
	open('/tmp/tsan_a.264','wb').write(gen_random_cabac_ipb_stream(8,6,n_gops=4,seed=3,closed=True,slices_per_frame=3)); \
	open('/tmp/tsan_b.264','wb').write(gen_random_ipp_stream(8,6,n_frames=8,seed=5,nrefs=2,slices_per_frame=4)); \
	open('/tmp/tsan_c.264','wb').write(gen_random_mvc_stream(5,4,n_aus=5,seed=7))"
	g++ -std=c++17 -O1 -g -fsanitize=thread tools/fuzz_native.cpp \
	    edge264_tpu/native/src/*.cpp -o /tmp/tsan_native -lpthread
	TSAN_OPTIONS=halt_on_error=1 /tmp/tsan_native -m \
	    /tmp/tsan_a.264 /tmp/tsan_b.264 /tmp/tsan_c.264

gentests:          ## regenerate cached generated streams (none persisted)
	@echo "test streams are generated on the fly by tools/avcgen.py"

clean:
	rm -f edge264_tpu/native/libe264t.so
	find . -name __pycache__ -type d | xargs rm -rf
