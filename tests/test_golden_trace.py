"""Golden-trace harness (utils/golden_trace.py + scripts/diff_reference_trace.py).

Synthetic fixtures: traces recorded from our own Simulator must replay to a
bitwise match, and any corruption — obs byte, reward, done, action stream —
must be caught and located.  This proves the differ's sensitivity so that a
single recording run on a CUDA host (scripts/record_reference_trace.py)
settles reference ground truth.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from madrona_rl_envs_playground_tpu.envs import hanabi, overcooked2
from madrona_rl_envs_playground_tpu.utils.golden_trace import (
    diff_trace,
    load_trace,
    record_trace,
    save_trace,
)

META = {"env": "overcooked2", "layout": "cramped_room", "num_envs": 4,
        "num_steps": 12, "horizon": 8, "source": "synthetic"}


def _fixture(tmp_path, mutate=None):
    env = overcooked2.make("cramped_room", horizon=8)
    arrays = record_trace(env, 4, 12, seed=0)
    if mutate is not None:
        mutate(arrays)
    path = str(tmp_path / "trace.npz")
    save_trace(path, META, **arrays)
    return path


@pytest.mark.quick
def test_selfmatch_bitwise(tmp_path):
    path = _fixture(tmp_path)
    summary = diff_trace(load_trace(path))
    assert summary["ok"], summary
    assert summary["fields"]["obs"]["mismatch"] == 0
    assert summary["fields"]["obs"]["total"] > 0


def test_corrupted_obs_caught(tmp_path):
    def mutate(a):
        a["obs"][5, 2, 1, 17] ^= 1

    summary = diff_trace(load_trace(_fixture(tmp_path, mutate)))
    assert not summary["ok"]
    f = summary["fields"]["obs"]
    assert f["mismatch"] == 1
    assert f["first"][0]["step"] == 5
    assert f["first"][0]["index"] == [2, 1, 17]


def test_corrupted_reward_and_done_caught(tmp_path):
    def mutate(a):
        a["rewards"][3, 1, 0] += 1.0
        a["dones"][7, 2] = ~a["dones"][7, 2]

    summary = diff_trace(load_trace(_fixture(tmp_path, mutate)))
    assert not summary["ok"]
    assert summary["fields"]["rewards"]["mismatch"] == 1
    assert summary["fields"]["dones"]["mismatch"] == 1


def test_perturbed_action_stream_diverges(tmp_path):
    """Changing one action must cascade into obs mismatches — the differ
    replays OUR engine with the recorded actions, so the recorded obs no
    longer match."""

    def mutate(a):
        a["actions"][2, 0, 0] = (a["actions"][2, 0, 0] + 1) % 6

    summary = diff_trace(load_trace(_fixture(tmp_path, mutate)))
    assert not summary["ok"]
    assert summary["fields"]["obs"]["mismatch"] > 0


def test_hanabi_trace_roundtrip(tmp_path):
    """The masked/turn-based env through the same harness, mask+active
    fields included."""
    env = hanabi.Env(**hanabi.CONFIGS["very_small"])
    arrays = record_trace(env, 4, 10, seed=1)
    meta = {"env": "hanabi", "layout": "very_small", "num_envs": 4,
            "num_steps": 10, "source": "synthetic"}
    path = str(tmp_path / "h.npz")
    save_trace(path, meta, **arrays)
    summary = diff_trace(load_trace(path))
    assert summary["ok"], summary
    assert summary["fields"]["action_mask"]["total"] > 0
    assert summary["fields"]["active"]["total"] > 0


def test_cli_exit_codes(tmp_path):
    """scripts/diff_reference_trace.py: 0 on match, 1 on mismatch."""
    root = Path(__file__).parents[1]
    good = _fixture(tmp_path)
    r = subprocess.run(
        [sys.executable, str(root / "scripts/diff_reference_trace.py"), good],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": "/root"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MATCH" in r.stdout

    bad = str(tmp_path / "bad.npz")
    env = overcooked2.make("cramped_room", horizon=8)
    arrays = record_trace(env, 4, 12, seed=0)
    arrays["obs0"] = arrays["obs0"].copy()
    arrays["obs0"][0, 0, 0] ^= 1
    save_trace(bad, META, **arrays)
    r = subprocess.run(
        [sys.executable, str(root / "scripts/diff_reference_trace.py"), bad],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": "/root"},
    )
    assert r.returncode == 1
    assert "MISMATCH" in r.stdout
