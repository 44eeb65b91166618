"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference's only distributed story is inherited accelerate/DeepSpeed hooks
(SURVEY §2.3); here DP+TP are first-class: these tests validate that the training
step and the speculative decode loop compile and run under GSPMD sharding, and that
sharded execution is numerically equivalent to single-device execution.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_medusa_tpu.config import tiny_test_config
from whisper_medusa_tpu.decoding.buffers import generate_medusa_buffers
from whisper_medusa_tpu.decoding.processors import ProcessorConfig
from whisper_medusa_tpu.decoding.speculative import speculative_generate
from whisper_medusa_tpu.models import medusa as medusa_mod
from whisper_medusa_tpu.models import whisper
from whisper_medusa_tpu.parallel import mesh as mesh_mod

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_mesh_shapes():
    m = mesh_mod.make_mesh(8)
    assert m.devices.shape == (2, 4)
    m = mesh_mod.make_mesh(4)
    assert m.devices.shape == (2, 2)
    m = mesh_mod.make_mesh(2)
    assert m.devices.shape == (1, 2)


def _model_for_mesh(tp):
    # Dims divisible by tp on all model-sharded axes.
    cfg = tiny_test_config(vocab_size=128 * tp, medusa_num_heads=3)
    cfg = cfg.replace(dims=cfg.dims)
    r1, r2 = jax.random.split(jax.random.PRNGKey(0))
    wp = whisper.init_whisper_params(r1, cfg.dims)
    mp = medusa_mod.init_medusa_params(r2, cfg.dims, cfg.medusa, wp)
    return cfg, {"whisper": wp, "medusa": mp}


def test_sharded_decode_matches_single_device():
    """DP+TP sharded speculative decode == unsharded decode, token for token."""
    mesh = mesh_mod.make_mesh(8)
    tp = mesh.devices.shape[1]
    cfg, params = _model_for_mesh(tp)
    rng = np.random.default_rng(0)
    b = 4
    feats = jnp.asarray(
        rng.normal(size=(b, cfg.dims.num_mel_bins, cfg.dims.num_frames)),
        jnp.float32)
    prompt = jnp.asarray(np.tile(rng.integers(6, 64, (1, 3)), (b, 1)), jnp.int32)
    pcfg = ProcessorConfig(vocab_size=cfg.dims.vocab_size, begin_index=3,
                           eos_token_id=5)
    from whisper_medusa_tpu.config import GenerationConfig
    gen = GenerationConfig(max_length=32, eos_token_id=5, pad_token_id=5,
                           suppress_tokens=None, begin_suppress_tokens=None)
    buffers = generate_medusa_buffers(cfg.medusa.medusa_choices)

    enc = whisper.encode(params["whisper"], cfg.dims, feats)
    res_single = speculative_generate(
        params["whisper"], params["medusa"], cfg.dims, buffers, pcfg, gen,
        enc, prompt, variant="base_head")

    sharded = mesh_mod.shard_params(params, mesh)
    dsh = mesh_mod.data_sharding(mesh)
    feats_s = jax.device_put(feats, dsh)
    prompt_s = jax.device_put(prompt, dsh)

    @jax.jit
    def run(wp, mp, feats, prompt):
        enc = whisper.encode(wp, cfg.dims, feats)
        return speculative_generate(
            wp, mp, cfg.dims, buffers, pcfg, gen, enc, prompt,
            variant="base_head")

    with jax.set_mesh(mesh):
        res_sharded = run(sharded["whisper"], sharded["medusa"], feats_s, prompt_s)

    np.testing.assert_array_equal(
        np.asarray(res_single.tokens), np.asarray(res_sharded.tokens))


@pytest.mark.parametrize("n", [2, 4])
def test_dryrun_multichip_smaller_meshes(n):
    """The driver may dry-run with various device counts; (dp,tp) factorizations
    must compile and run for each."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)
