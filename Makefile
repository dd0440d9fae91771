# Convenience targets (reference: edge264 Makefile; here the C++ front end
# builds itself on import, so make mostly wraps the Python workflows).

PY ?= python

.PHONY: all native check bench fuzz gentests clean

all: native

native:            ## build the C++ entropy front end (libe264t.so)
	$(PY) -c "from edge264_tpu.native import build; print(build(force=True))"

check:             ## full test suite (CPU; 8-device virtual mesh)
	$(PY) -m pytest tests/ -q

bench:             ## end-to-end 1080p benchmark (one JSON line)
	$(PY) bench.py

fuzz:              ## ASan+UBSan fuzz corpus over the C++ front end
	$(PY) tools/fuzz_corpus.py

gentests:          ## regenerate cached generated streams (none persisted)
	@echo "test streams are generated on the fly by tools/avcgen.py"

clean:
	rm -f edge264_tpu/native/libe264t.so
	find . -name __pycache__ -type d | xargs rm -rf
