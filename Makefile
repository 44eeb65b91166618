# Convenience targets (CPU tests pin themselves to a virtual 8-device mesh).

.PHONY: test bench bench-batch bench-int8 demo dryrun native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-batch:
	python bench.py --batch 8

bench-int8:
	python bench.py --int8

demo:
	python examples/transcribe.py --demo

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python __graft_entry__.py

native:
	g++ -O3 -shared -fPIC -std=c++17 native/audio_io.cpp -o native/libwm_audio.so
