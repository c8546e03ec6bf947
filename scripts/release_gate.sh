#!/usr/bin/env bash
# Release gate (round-3 VERDICT hygiene item 9): ONE command that fails
# if the package, the core test subset, the multi-chip sharding path, or
# the bench harness regresses — including a wall-clock BUDGET on the
# not-slow subset so the suite cannot silently inflate round over round
# (observed growth: 9:10 for 214 tests on this 1-core rig at round 3).
#
#   bash scripts/release_gate.sh            # full gate (~12 min)
#   SKIP_WHEEL=1 bash scripts/release_gate.sh   # iterate faster
#
# Budget override: NOT_SLOW_BUDGET_S (default 780 s = 13 min, headroom
# over the round-3 9:10 measurement on this rig; CI rigs differ).
set -euo pipefail
cd "$(dirname "$0")/.."

BUDGET=${NOT_SLOW_BUDGET_S:-780}
FAIL=0

echo "== 1/4 wheel builds and installs standalone"
if [ "${SKIP_WHEEL:-0}" != "1" ]; then
    rm -rf /tmp/release_gate_wheel
    # --no-build-isolation: setuptools is baked into the image and the
    # rig has zero egress (pip cannot reach pypi for an isolated env)
    python -m pip wheel --no-deps --no-build-isolation \
        -w /tmp/release_gate_wheel . -q
    ls /tmp/release_gate_wheel/*.whl
    python - <<'EOF'
import zipfile, glob
whl = glob.glob("/tmp/release_gate_wheel/*.whl")[0]
names = zipfile.ZipFile(whl).namelist()
assert any("assets/nira_template_15_norm.npy" in n for n in names), \
    "adjacency asset missing from the wheel"
assert any("assets/stats/" in n for n in names), \
    "stats assets missing from the wheel"
print("wheel contents ok:", whl)
EOF
else
    echo "(skipped: SKIP_WHEEL=1)"
fi

echo "== 2/4 not-slow test subset under the ${BUDGET}s budget"
T0=$(date +%s)
python -m pytest tests/ -m 'not slow' -q --tb=short
T1=$(date +%s)
ELAPSED=$((T1 - T0))
echo "not-slow subset: ${ELAPSED}s (budget ${BUDGET}s)"
if [ "$ELAPSED" -gt "$BUDGET" ]; then
    echo "FAIL: the not-slow subset exceeded its ${BUDGET}s budget —"
    echo "move tests to @pytest.mark.slow or tighten them before release"
    FAIL=1
fi

echo "== 3/4 multi-chip sharding dry run (8 virtual CPU devices)"
env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as xb
if not xb.backends_are_initialized():
    xb._backend_factories.pop("axon", None)
import sys; sys.path.insert(0, ".")
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun_multichip(8) ok")
EOF

echo "== 4/4 bench + entry harnesses import clean"
env JAX_PLATFORMS=cpu python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as xb
if not xb.backends_are_initialized():
    xb._backend_factories.pop("axon", None)
import sys; sys.path.insert(0, ".")
import importlib
for mod in ("bench", "__graft_entry__"):
    importlib.import_module(mod)
import __graft_entry__ as g
fn, args = g.entry()
print("entry() ok:", type(fn).__name__, len(args), "args")
EOF

if [ "$FAIL" != "0" ]; then
    echo "RELEASE GATE: FAILED (suite budget)"
    exit 1
fi
echo "RELEASE GATE: PASSED"
