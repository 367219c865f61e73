# Round health check: everything the round ships, verified in one command.
#
#   make verify        - full suite + artifact schema checks + bench (CPU
#                        fallback if the TPU tunnel is down) + the 8-device
#                        virtual-mesh dry run
#   make verify-fast   - the consistency gates only (artifact schemas,
#                        multichip dry run, bench) without the ~34 min suite
#
# The default suite deselects the nightly marker (pytest.ini); `make verify`
# is the pre-ship gate, not the nightly.

PY ?= python

.PHONY: verify verify-fast suite schemas bench multichip bank

verify: suite schemas bench multichip
	@echo "== verify: ALL GREEN =="

verify-fast: schemas bench multichip
	@echo "== verify-fast: ALL GREEN =="

suite:
	$(PY) -m pytest tests/ -q

schemas:
	$(PY) -m pytest -q \
	  tests/test_workflows.py::test_demo1_artifact_schema \
	  tests/test_workflows.py::test_demo2_artifact_schema \
	  tests/test_workflows.py::test_paper_parity_schema

bench:
	$(PY) bench.py

multichip:
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('multichip ok')"

# Commit every expensive result part the moment it exists — these are
# ~45-TPU-minute files; run this after (or during) any artifact
# regeneration so a crash or `git clean` can't lose banked work.
bank:
	git add docs/results/parts docs/results/*.json docs/results/*.png
	git diff --cached --quiet || git commit -m "Bank result parts/artifacts"
