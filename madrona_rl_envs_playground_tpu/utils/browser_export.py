"""Browser-loadable actor export (the ``torch_to_tfjs.py`` analog).

The reference ships trained MAPPO actors to its static JS demo through a
torch -> ONNX -> TF -> TFJS chain (``/root/reference/train/torch_to_tfjs.py:1-40``,
consumed by ``overcooked_demo/static/``).  TFJS isn't a dependency here, so
the same capability is a self-contained bundle:

* ``model.json`` — an op-list schema (layernorm / dense / relu / tanh /
  masked_softmax) with inlined fp32 weights, mechanically derived from the
  flax actor params;
* ``policy.js`` — a ~70-line dependency-free ES module that interprets the
  schema (the demo-side replacement for the TFJS runtime);
* ``testvector.json`` — a logged observation/action-mask plus the action
  probabilities computed by the real flax actor at export time;
* ``demo.html`` — static page that loads all three, runs the JS forward,
  and reports PASS/FAIL against the test vector (open in any browser; no
  server or build step).

``run_ops`` is the numpy twin of the JS interpreter — op-for-op identical —
so the pytest smoke (``tests/test_browser_export.py``) can validate the
round trip (export -> reload model.json -> interpret -> match flax logits)
without a JS runtime in CI.
"""

from __future__ import annotations

import json
import os

import numpy as np

MASK_NEG = -1e10  # keep in sync with models/common.py and mappo_nets.py


# ---------------------------------------------------------------------------
# schema construction from flax params
# ---------------------------------------------------------------------------

def mappo_actor_to_ops(actor_params, model_cfg, num_actions: int):
    """Op list for a feed-forward R_Actor (MLPBase + ACTLayer).

    Mirrors ``models/mappo_nets.py``: optional feature LayerNorm, then
    (1 + layer_N) x [Dense -> act -> LayerNorm], then the action head with
    illegal-logit masking and softmax (the reference's exported ``Policy``
    ends in softmax, ``torch_to_tfjs.py:30-34``).
    """
    if model_cfg.use_recurrent_policy:
        raise ValueError("browser export supports feed-forward actors only")
    p = actor_params["params"]
    base, act = p["base"], p["act"]
    ops = []

    def layernorm(lp):
        ops.append({
            "op": "layernorm",
            "scale": np.asarray(lp["scale"], np.float32).tolist(),
            "bias": np.asarray(lp["bias"], np.float32).tolist(),
            "eps": 1e-6,
        })

    def dense(dp):
        ops.append({
            "op": "dense",
            "kernel": np.asarray(dp["kernel"], np.float32).tolist(),
            "bias": np.asarray(dp["bias"], np.float32).tolist(),
        })

    n_dense = sum(1 for k in base if k.startswith("Dense_"))
    ln_idx = 0
    if model_cfg.use_feature_normalization:
        layernorm(base[f"LayerNorm_{ln_idx}"])
        ln_idx += 1
    for i in range(n_dense):
        dense(base[f"Dense_{i}"])
        ops.append({"op": "relu" if model_cfg.use_relu else "tanh"})
        layernorm(base[f"LayerNorm_{ln_idx}"])
        ln_idx += 1
    dense(act["Dense_0"])
    ops.append({"op": "masked_softmax", "mask_value": MASK_NEG})
    return ops


def run_ops(ops, x, mask=None):
    """Numpy interpreter for the op schema — the exact twin of policy.js."""
    x = np.asarray(x, np.float64)
    for op in ops:
        kind = op["op"]
        if kind == "layernorm":
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            x = (x - mu) / np.sqrt(var + op["eps"])
            x = x * np.asarray(op["scale"]) + np.asarray(op["bias"])
        elif kind == "dense":
            x = x @ np.asarray(op["kernel"]) + np.asarray(op["bias"])
        elif kind == "relu":
            x = np.maximum(x, 0.0)
        elif kind == "tanh":
            x = np.tanh(x)
        elif kind == "masked_softmax":
            if mask is not None:
                x = np.where(np.asarray(mask, bool), x, op["mask_value"])
            x = x - x.max(-1, keepdims=True)
            e = np.exp(x)
            x = e / e.sum(-1, keepdims=True)
        else:  # pragma: no cover
            raise ValueError(f"unknown op {kind}")
    return x


# ---------------------------------------------------------------------------
# bundle writer
# ---------------------------------------------------------------------------

_POLICY_JS = """\
// Dependency-free actor forward for the exported model.json op schema.
// Twin of run_ops() in utils/browser_export.py — keep the two in sync.
export function forward(model, obs, mask) {
  let x = Array.from(obs, Number);
  for (const op of model.ops) {
    if (op.op === "layernorm") {
      const n = x.length;
      const mu = x.reduce((a, b) => a + b, 0) / n;
      const va = x.reduce((a, b) => a + (b - mu) * (b - mu), 0) / n;
      const inv = 1.0 / Math.sqrt(va + op.eps);
      x = x.map((v, i) => (v - mu) * inv * op.scale[i] + op.bias[i]);
    } else if (op.op === "dense") {
      const out = op.bias.slice();
      for (let i = 0; i < x.length; i++) {
        const xi = x[i], row = op.kernel[i];
        for (let j = 0; j < out.length; j++) out[j] += xi * row[j];
      }
      x = out;
    } else if (op.op === "relu") {
      x = x.map((v) => Math.max(v, 0));
    } else if (op.op === "tanh") {
      x = x.map(Math.tanh);
    } else if (op.op === "masked_softmax") {
      if (mask) x = x.map((v, i) => (mask[i] ? v : op.mask_value));
      const m = Math.max(...x);
      const e = x.map((v) => Math.exp(v - m));
      const s = e.reduce((a, b) => a + b, 0);
      x = e.map((v) => v / s);
    } else {
      throw new Error("unknown op " + op.op);
    }
  }
  return x;
}

export function sampleGreedy(probs) {
  let best = 0;
  for (let i = 1; i < probs.length; i++) if (probs[i] > probs[best]) best = i;
  return best;
}
"""

_DEMO_HTML = """\
<!doctype html>
<html>
<head><meta charset="utf-8"><title>Actor self-check</title></head>
<body>
<h1>Exported actor self-check</h1>
<pre id="out">loading...</pre>
<script type="module">
import { forward } from "./policy.js";
const model = await (await fetch("./model.json")).json();
const tv = await (await fetch("./testvector.json")).json();
const probs = forward(model, tv.obs, tv.action_mask);
let maxerr = 0;
for (let i = 0; i < probs.length; i++)
  maxerr = Math.max(maxerr, Math.abs(probs[i] - tv.expected_probs[i]));
document.getElementById("out").textContent =
  (maxerr < 1e-4 ? "PASS" : "FAIL") +
  "  max |probs - expected| = " + maxerr.toExponential(3) +
  "\\nprobs = " + JSON.stringify(probs.map((p) => p.toFixed(6)));
</script>
</body>
</html>
"""


def export_browser_bundle(outdir: str, actor_params, model_cfg, num_actions: int,
                          example_obs, example_mask=None, meta=None):
    """Write model.json / policy.js / testvector.json / demo.html.

    ``expected_probs`` in the test vector comes from the numpy interpreter,
    which tests verify against the flax actor — so the committed artifact is
    self-checking in the browser AND pinned to the real network in CI.
    """
    os.makedirs(outdir, exist_ok=True)
    ops = mappo_actor_to_ops(actor_params, model_cfg, num_actions)
    model = {"format": "mre-tpu-actor-v1", "num_actions": num_actions,
             "meta": meta or {}, "ops": ops}
    with open(os.path.join(outdir, "model.json"), "w") as f:
        json.dump(model, f)
    obs = np.asarray(example_obs, np.float32).reshape(-1)
    mask = (None if example_mask is None
            else np.asarray(example_mask, bool).reshape(-1))
    probs = run_ops(ops, obs, mask)
    tv = {
        "obs": obs.tolist(),
        "action_mask": None if mask is None else mask.astype(int).tolist(),
        "expected_probs": np.asarray(probs, np.float64).tolist(),
    }
    with open(os.path.join(outdir, "testvector.json"), "w") as f:
        json.dump(tv, f)
    with open(os.path.join(outdir, "policy.js"), "w") as f:
        f.write(_POLICY_JS)
    with open(os.path.join(outdir, "demo.html"), "w") as f:
        f.write(_DEMO_HTML)
    return model
