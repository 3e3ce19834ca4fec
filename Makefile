# Build system for volumerenderer_tpu (the reference's CMake equivalent:
# CMakeLists.txt + shaders/CMakeLists.txt — here the "shaders" are Pallas
# kernels compiled by XLA at runtime, so the only ahead-of-time artifact is
# the native ingestion library).

CXX ?= g++
CXXFLAGS ?= -O2 -fPIC -shared -std=c++17
NATIVE := volumerenderer_tpu/native

.PHONY: all native test test-all bench clean

all: native

native: $(NATIVE)/libvdbio.so

$(NATIVE)/libvdbio.so: $(NATIVE)/vdbio.cpp $(NATIVE)/vdb_read.cpp $(NATIVE)/vdb_write.cpp $(NATIVE)/imageio.cpp $(NATIVE)/lz4_blosc.h
	$(CXX) $(CXXFLAGS) $(NATIVE)/vdbio.cpp $(NATIVE)/vdb_read.cpp $(NATIVE)/vdb_write.cpp $(NATIVE)/imageio.cpp -o $@ -lz

# Fast default subset: skips the @pytest.mark.slow parametrizations whose
# cold XLA compiles dominate the wall clock.  Both targets share the
# persistent compilation cache (.jax_cache_cpu, set up by
# tests/conftest.py), so repeat runs of either are several times faster
# than cold.  conftest also unloads compiled executables per test module
# — XLA:CPU otherwise exhausts vm.max_map_count over a full run and
# segfaults (see the postmortem in tests/conftest.py).
test: native
	python -m pytest tests/ -q -m "not slow"

test-all: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	rm -f $(NATIVE)/libvdbio.so
	find . -name __pycache__ -type d -exec rm -rf {} +
