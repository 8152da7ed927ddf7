# superman_tpu build/test entry points.
# Parity: the reference's Makefile (nvcc) + interface_make (libConnect.so);
# here the accelerator path is JIT-compiled by XLA, so "build" only means
# the native C++ OpenMP engine.

.PHONY: native test bench accuracy clean

native:
	python -m superman_tpu.native.build --force

test:
	python -m pytest tests/ -q

bench:
	python bench.py

accuracy:
	python -m superman_tpu.tools.accuracy --quick \
		-f /root/reference/revised_perman/matrices/Ragusa16.mtx

clean:
	rm -f superman_tpu/native/libsuperman_cpu.so
