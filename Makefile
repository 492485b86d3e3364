# Convenience targets (the reference's root Makefile wrapped its cmake
# build the same way; SURVEY.md §2 "Build system").
.PHONY: all native test bench clean

all: native

native:              ## build the C++ host runtime (libpose_host.so)
	$(MAKE) -C native

test:                ## full suite on the virtual 8-device CPU mesh
	python -m pytest tests/ -q

bench:               ## end-to-end device benchmark (one JSON line)
	python bench.py

clean:
	$(MAKE) -C native clean
