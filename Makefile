# Task entry points, preserving the reference's `make <task>` interface
# (reference Makefile:6-19).
.PHONY: metaseg meta_overlay stat_fish fish_distance_calculation interseg test bench clean

metaseg:
	python -m ecseg_tpu.pipelines.metaseg

meta_overlay:
	python -m ecseg_tpu.pipelines.meta_overlay

stat_fish:
	python -m ecseg_tpu.pipelines.stat_fish

fish_distance_calculation:
	python -m ecseg_tpu.pipelines.fish_distance

interseg:
	python -m ecseg_tpu.pipelines.interseg

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -rf __pycache__ ecseg_tpu/__pycache__

native:
	g++ -O3 -march=native -shared -fPIC -o ecseg_tpu/native/libecseg_native.so ecseg_tpu/native/cc_maxflow.cpp
