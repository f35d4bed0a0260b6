"""IBM MLPSpeculator proposer (reference
vllm/model_executor/models/mlp_speculator.py + MLPSpeculatorWorker).

A stack of per-position MLP heads that predict the next k tokens from the
base model's LAST HIDDEN STATE and the last sampled token — no KV cache,
no attention. TPU-reshaped: all heads run in ONE jitted call producing the
whole [B, k] greedy proposal tensor (the reference samples head-by-head
through the full Sampler; proposals are verified losslessly downstream, so
greedy argmax proposals preserve the output distribution).

Recurrence per head i (reference generate_proposals):
  state   = proj_i(prev_state) + (emb_weight/state_weight) * emb_i(token)
  state   = gelu(ln_i(state));  logits_i = head_i(state)
with state_weight = 0.5**(0.5/n_predict),
emb_weight = sqrt((1 - state_weight^2) * inner_dim/2); optional ln0
input scaling (scale_input) divides by sqrt(2).
"""
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from neural_magic_vllm_tpu.models import register_model


def _mlp_ln(x, scale, bias, eps=1e-6):
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    if scale is not None:
        x = x * scale + bias
    return x


@register_model("MLPSpeculatorPreTrainedModel")
class MLPSpeculator:

    def __init__(self, model_config, parallel_config=None,
                 quant_config=None) -> None:
        cfg = model_config.hf_config
        self.cfg = cfg
        self.dtype = jnp.dtype(model_config.dtype)
        self.n_predict = cfg.n_predict
        self.vocab_size = cfg.vocab_size
        self.emb_dim = cfg.emb_dim
        self.inner_dim = cfg.inner_dim if cfg.inner_dim else cfg.emb_dim
        self.tie_weights = bool(getattr(cfg, "tie_weights", False))
        self.scale_input = bool(getattr(cfg, "scale_input", False))
        self.state_weight = 0.5**(0.5 / self.n_predict)
        self.emb_weight = math.sqrt(
            (1 - self.state_weight**2) * (self.inner_dim / 2))

    # --- params ---------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1]) \
            if hasattr(rng, "dtype") and rng.dtype.kind == "V" else \
            int(np.asarray(rng).ravel()[-1])
        r = np.random.default_rng(seed)
        V, Di, De = self.vocab_size, self.inner_dim, self.emb_dim
        n = self.n_predict

        def head(i):
            return {
                "emb": (r.standard_normal((V, Di)) * 0.02).astype(np.float32),
                "proj": (r.standard_normal(
                    (De if i == 0 else Di, Di)) * 0.02).astype(np.float32),
                "head": (r.standard_normal((Di, V)) * 0.02).astype(
                    np.float32),
                "ln_scale": np.ones((Di, ), np.float32),
                "ln_bias": np.zeros((Di, ), np.float32),
            }

        params = {"heads": [head(i) for i in range(n)]}
        if self.scale_input:
            params["ln0"] = np.zeros((0, ), np.float32)  # no-affine marker
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, self.dtype)
            if x.dtype == np.float32 else jnp.asarray(x), params)

    def param_specs(self):
        from jax.sharding import PartitionSpec as P
        return {}  # replicated (speculator is small)

    def load_params(self, model_dir: str) -> Dict[str, Any]:
        from neural_magic_vllm_tpu.models.weight_utils import \
            iterate_safetensors
        n = self.n_predict
        heads = [dict() for _ in range(n)]
        for name, w in iterate_safetensors(model_dir):
            name = name.replace("speculator.", "")
            parts = name.split(".")
            if parts[0] == "emb":
                heads[int(parts[1])]["emb"] = w
            elif parts[0] == "proj":
                heads[int(parts[1])]["proj"] = w.T.copy()
            elif parts[0] == "head":
                heads[int(parts[1])]["head"] = w.T.copy()
            elif parts[0] == "ln" and parts[2] == "weight":
                heads[int(parts[1])]["ln_scale"] = w
            elif parts[0] == "ln" and parts[2] == "bias":
                heads[int(parts[1])]["ln_bias"] = w
        if self.tie_weights:
            for i in range(1, n):
                for key in ("emb", "head", "ln_scale", "ln_bias"):
                    heads[i].setdefault(key, heads[0][key])
                heads[i].setdefault("proj", heads[1 if n > 1 else 0].get(
                    "proj", heads[0]["proj"]))
        params = {"heads": heads}
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                x, self.dtype if np.asarray(x).dtype.kind == "f" else None),
            params)

    # --- propose ----------------------------------------------------------------
    def propose(self, params: Dict[str, Any], last_tokens: jax.Array,
                hidden: jax.Array, k: int) -> jax.Array:
        """[B] last sampled token + [B, emb_dim] base-model hidden ->
        [B, k] greedy proposals (k <= n_predict)."""
        state = hidden.astype(self.dtype)
        if self.scale_input:
            state = _mlp_ln(state, None, None) / (2**0.5)
        toks = last_tokens
        out = []
        for i in range(min(k, self.n_predict)):
            hp = params["heads"][i]
            z = jnp.take(hp["emb"], toks, axis=0)
            state = jnp.dot(state, hp["proj"]) + \
                (self.emb_weight / self.state_weight) * z
            state = jax.nn.gelu(
                _mlp_ln(state, hp["ln_scale"], hp["ln_bias"]),
                approximate=False)
            logits = jnp.dot(state, hp["head"],
                             preferred_element_type=jnp.float32)
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            out.append(toks)
        return jnp.stack(out, axis=1)
