# Developer entry points (see .claude/skills/verify/SKILL.md for TPU quirks)

.PHONY: test test-all smoke-tpu bench sweep oracle plots clean

test:
	python -m pytest tests/ -q

test-all:
	python -m pytest tests/ -q --runslow

# pinned on-TPU regression smoke (~2-4 min): real-Mosaic kernel paths with
# known-good perf floors + a dense-force cross-check.  ONE TPU process at
# a time (see .claude/skills/verify/SKILL.md).
smoke-tpu:
	timeout 1200 python scripts/smoke_tpu.py

bench:
	python bench.py

oracle:
	$(MAKE) -C native

sweep:
	python scripts/perf_benchmark.py -o results/combined_nbody_tpu.csv \
	  -p 1000 10000 30000 50000 100000 \
	  --engines brute-pallas bh bh-lazy --steps 200 --repeats 2 --chunk 200

plots:
	python scripts/analyze_benchmarks.py results/combined_nbody_tpu.csv \
	  /root/reference/combined_nbody_llm_opt.csv \
	  /root/reference/combined_nbody_man_opt.csv \
	  /root/reference/combined_rebound.csv \
	  --names nbody-tpu "LLM BH (ref)" "Manual BH (ref)" "rebound (ref)" \
	  --steps 200 --out results/performance_plots_comparison

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
