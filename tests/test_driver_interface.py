"""Contracts the round driver depends on: bench JSON schema and the
__graft_entry__ API. These construct everything on CPU without timing."""

import json
import pytest
import subprocess
import sys


def test_bench_constants_and_schema():
    """bench.py must print exactly one JSON line with the agreed keys; we
    validate the schema by constructing the dict the same way (running the
    full TPU bench is the driver's job)."""
    import bench

    assert bench.DENOISE_STEPS == 100
    assert bench.B == 96 and bench.L == 128
    line = json.dumps({
        "metric": "denoise_steps_per_sec_per_chip_PED_eval(B96,L128,ddim100)",
        "value": 1.0, "unit": "steps/sec/chip", "vs_baseline": 1.0})
    parsed = json.loads(line)
    assert set(parsed) == {"metric", "value", "unit", "vs_baseline"}
    assert bench.BASELINE_STEPS_PER_SEC > 0


@pytest.mark.slow  # dryrun_multichip: 6 sharded-config train steps on an 8-device CPU mesh
def test_graft_entry_contract():
    """entry() -> (callable, example_args) jittable on the test backend;
    dryrun_multichip runs a sharded step on all local devices."""
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 128, 6)
    g.dryrun_multichip(jax.device_count())
