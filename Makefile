# Convenience targets (the reference's root Makefile wrapped its cmake
# build the same way; SURVEY.md §2 "Build system").
.PHONY: all native test test-all bench clean

all: native

native:              ## build the C++ host runtime (libpose_host.so)
	$(MAKE) -C native

test:                ## fast tier: parity + unit coverage, <3 min
	python -m pytest tests/ -q

test-all:            ## full suite incl. slow compile-heavy tests (CI gate)
	python -m pytest tests/ -q --runslow

bench:               ## end-to-end device benchmark (one JSON line)
	python bench.py

clean:
	$(MAKE) -C native clean
