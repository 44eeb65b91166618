"""Device-mesh parallelism: DP + TP shardings over ICI via GSPMD.

The reference has no parallelism of its own — DP/ZeRO arrive via HF accelerate and
NCCL (SURVEY §2.3; reference: medusa_trainer_cls.py:142-156, model.py:947-951).
The TPU-native replacement: a ``jax.sharding.Mesh`` with axes ``("data", "model")``;
parameters/activations carry ``NamedSharding`` annotations and XLA's SPMD partitioner
inserts the collectives (all-gather/psum/reduce-scatter) over ICI.  There is no
"synced_gpus" problem to patch around: every device runs the same fixed-shape
``lax.while_loop`` program.

Sharding rules (whisper-large is the target):
  * batch axis of activations/features  -> "data"
  * attention head projections (q/k/v out-dim, o in-dim)  -> "model"
  * FFN hidden dim (fc1 out, fc2 in)  -> "model"
  * token embedding / vocab projection rows  -> "model"  (the 51865-row matrix is
    the single biggest weight; sharding it also shards the logits matmul)
  * everything small (layernorms, convs, positional embeddings, medusa heads)
    replicated.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh.  Defaults: tp = largest divisor of n <= 4."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None and tp is None:
        # Prefer a 2D mesh (both axes active) so DP collectives and TP sharding
        # are both exercised: n=8 -> (2,4), n=4 -> (2,2), n=2 -> (1,2).
        if n % 8 == 0:
            tp = 4
        elif n % 2 == 0:
            tp = 2
        else:
            tp = 1
        dp = n // tp
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp * tp} != n_devices={n}")
    if len(devices) < n:
        raise ValueError(
            f"make_mesh needs {n} devices but only {len(devices)} are visible "
            f"({[d.platform for d in devices]}). For a virtual mesh on one host, "
            "start the process with JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} "
            "(see tests/conftest.py), or pass devices= explicitly.")
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def _attn_spec(prefix: str) -> Dict[str, P]:
    # q/k/v project d -> d(heads): shard the head (output) dim; o projects back:
    # shard the input dim.  Stacked layer axis stays unsharded.
    return {
        "q_w": P(None, None, MODEL_AXIS),
        "q_b": P(None, MODEL_AXIS),
        "k_w": P(None, None, MODEL_AXIS),
        "v_w": P(None, None, MODEL_AXIS),
        "v_b": P(None, MODEL_AXIS),
        "o_w": P(None, MODEL_AXIS, None),
        "o_b": P(None, None),
    }


def _layer_specs() -> Dict[str, Any]:
    reps2 = {"scale": P(None, None), "bias": P(None, None)}
    return {
        "self_ln": reps2,
        "self": _attn_spec("self"),
        "cross_ln": reps2,
        "cross": _attn_spec("cross"),
        "ffn_ln": reps2,
        "fc1_w": P(None, None, MODEL_AXIS),
        "fc1_b": P(None, MODEL_AXIS),
        "fc2_w": P(None, MODEL_AXIS, None),
        "fc2_b": P(None, None),
    }


def whisper_param_specs(params: Params, tp: int = 1) -> Params:
    """PartitionSpec pytree matching a whisper params pytree.

    The tied embedding / vocab projection is row-sharded (vocab axis) when the
    vocabulary divides by tp; otherwise column-sharded (d_model axis — whisper's
    51865-row vocab is odd, divisible by no tp>1, so the projection contracts
    over a sharded axis and XLA inserts the psum)."""
    vocab = None
    if params:
        emb = params.get("decoder", {}).get("embed_tokens")
        if isinstance(emb, dict):          # int8 serving mode ({"q","s"})
            emb = emb["q"]
        if emb is not None:
            vocab = emb.shape[0]
    embed_spec = P(MODEL_AXIS, None) if (vocab is None or tp <= 1
                                         or vocab % tp == 0) \
        else P(None, MODEL_AXIS)
    enc_layers = {k: v for k, v in _layer_specs().items()
                  if k not in ("cross", "cross_ln")}
    specs = {
        "encoder": {
            "conv1_w": P(), "conv1_b": P(),
            "conv2_w": P(), "conv2_b": P(),
            "pos_embed": P(),
            "layers": enc_layers,
            "ln_post": {"scale": P(), "bias": P()},
        },
        "decoder": {
            "embed_tokens": embed_spec,
            "pos_embed": P(),
            "layers": _layer_specs(),
            "ln_post": {"scale": P(), "bias": P()},
        },
    }
    return specs


def medusa_param_specs(medusa_params: Params) -> Params:
    specs: Params = {"heads": {"w": P(), "b": P()}}
    if "block" in medusa_params:
        block = dict(_layer_specs())
        block = jax.tree.map(
            lambda p: P(*p[1:]) if isinstance(p, P) else p, block,
            is_leaf=lambda x: isinstance(x, P))
        specs["block"] = block
    if "teacher_layer" in medusa_params:
        specs["teacher_layer"] = specs.get("block") or jax.tree.map(
            lambda p: P(*p[1:]) if isinstance(p, P) else p, dict(_layer_specs()),
            is_leaf=lambda x: isinstance(x, P))
    return specs


def model_param_specs(params: Params, tp: int = 1) -> Params:
    specs: Params = {"whisper": whisper_param_specs(params["whisper"], tp)}
    if "medusa" in params:
        specs["medusa"] = medusa_param_specs(params["medusa"])
    return specs


def _is_qdict(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"q", "s"}


def _quantized_specs(params, specs, key=None):
    """Expand weight specs over int8 ``{"q", "s"}`` dicts (ops/qmm.py).

    The int8 tensor keeps the full-precision weight's spec; the scale vector
    keeps whichever of those axes survive in its (contraction-axis-dropped)
    shape — e.g. a head-sharded ``q_w`` (L, D, D*)@(None, None, model) gets
    scales (L, D*)@(None, model), while the row-quantized embedding drops the
    trailing axis.  The dropped axis is decided by the param *name* — only
    ``embed_tokens`` is row-quantized (quantize_decoder, axis=-1) — never by
    shape equality, which is ambiguous for square tensors."""
    if isinstance(specs, P):
        if _is_qdict(params):
            q, s = params["q"], params["s"]
            padded = list(specs) + [None] * (q.ndim - len(specs))
            drop = -1 if key == "embed_tokens" else -2
            expect = q.shape[:q.ndim + drop] + q.shape[q.ndim + drop + 1:]
            if s.shape == expect:
                s_spec = P(*(padded[:q.ndim + drop]
                             + padded[q.ndim + drop + 1:]))
            else:
                s_spec = P()
            return {"q": specs, "s": s_spec}
        return specs
    if isinstance(specs, dict):
        return {k: _quantized_specs(
            params.get(k) if isinstance(params, dict) else None, v, k)
            for k, v in specs.items()}
    return specs


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Place a params pytree onto the mesh with the standard TP shardings.

    Handles both the bf16 tree and the int8 serving-mode tree (weights as
    ``{"q", "s"}`` dicts).  On a multi-process (multi-host) mesh the target
    shardings span non-addressable devices, so each process contributes its
    own shards via ``make_array_from_callback`` (every process holds the same
    host value; no cross-host copies)."""
    import numpy as _np

    tp = int(mesh.devices.shape[1])
    specs = model_param_specs(params, tp) if "whisper" in params else \
        whisper_param_specs(params, tp)
    specs = _quantized_specs(params, specs)
    multiprocess = jax.process_count() > 1

    def put(a, s):
        sh = NamedSharding(mesh, s)
        if not multiprocess:
            return jax.device_put(a, sh)
        host = _np.asarray(a)
        return jax.make_array_from_callback(host.shape, sh,
                                            lambda idx: host[idx])

    return jax.tree.map(put, params, specs,
                        is_leaf=lambda x: not isinstance(x, dict))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))
