"""int4 paged KV pool (nibble-packed codes + per-row scales).

TPU extension beyond the reference (which has no paged KV at all —
context overflow is an error, inference_session.rs:311-313): halves the
KV page bytes vs int8, the dominant HBM traffic at high-batch serving.
Correctness strategy mirrors the int8 pool tests: single-step vs
multi-step block exactness, Pallas-kernel (interpret) vs jnp page-scan
equality, and composition with the prefix cache and engine snapshots.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.loader import ModelParameters, load
from llm_tpu.paged import PagedEngine, init_paged_cache
from llm_tpu.samplers import DeterministicSampler
from llm_tpu.serve import GenerationRequest
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("i4") / "llama.bin"
    make_tiny_file("llama", path)
    return load(path, "llama", params=ModelParameters(context_size=64))


@pytest.fixture(scope="module")
def model_d128(tmp_path_factory):
    path = tmp_path_factory.mktemp("i4k") / "llama128.bin"
    make_tiny_file("llama", path, n_embd=512)  # 4 heads -> D = 128
    return load(path, "llama", params=ModelParameters(context_size=64))


PROMPT = "".join(f"<t{i}>" for i in range(2, 21))


def _run(engine, prompt=PROMPT, n=8, n_steps=1, device_sampler=None):
    texts = engine.generate_all(
        [
            GenerationRequest(
                prompt=prompt, max_tokens=n, sampler=DeterministicSampler(),
                device_sampler=device_sampler,
            )
        ],
        n_steps=n_steps,
    )
    return texts[min(texts)]


def test_pack_unpack_roundtrip():
    from llm_tpu.ops.packing import pack_int4_rows, unpack_int4_rows

    rng = np.random.default_rng(0)
    q = rng.integers(-7, 8, size=(3, 5, 128)).astype(np.int8)
    p = pack_int4_rows(jnp.asarray(q))
    assert p.shape == (3, 5, 64) and p.dtype == jnp.uint8
    assert (np.asarray(unpack_int4_rows(p)) == q).all()


def test_pool_bits_and_shapes(model):
    pool = init_paged_cache(model.spec, 4, 8, "int4")
    assert pool.bits == 4 and pool.qmax == 7.0
    assert pool.k.dtype == jnp.uint8
    assert pool.k.shape[-1] == model.spec.head_dim // 2
    assert pool.k_scale.shape[-1] == 8  # per-row scales, unpacked width
    i8 = init_paged_cache(model.spec, 4, 8, "int8")
    assert i8.bits == 8 and i8.qmax == 127.0
    dense = init_paged_cache(model.spec, 4, 8, jnp.float32)
    assert dense.bits is None and dense.qmax is None


def test_int4_engine_matches_f32_on_tiny_model(model):
    """4-bit KV keeps the tiny model's greedy trajectory (a quality
    statement, not an invariant — the fixture weights are seeded)."""
    ref = _run(PagedEngine(model, max_streams=2, page_size=8,
                           kv_dtype=jnp.float32))
    got = _run(PagedEngine(model, max_streams=2, page_size=8,
                           kv_dtype="int4"))
    assert got == ref


def test_int4_step_vs_step_multi_exact(model):
    """The block path's unpacked int8 block buffer + end-of-block nibble
    pack must reproduce the single-step path bit-exactly (codes are
    identical; unpack(pack(codes)) is lossless)."""
    from llm_tpu.ops.sampling import DeviceSampler

    a = _run(PagedEngine(model, max_streams=2, page_size=8,
                         kv_dtype="int4"),
             device_sampler=DeviceSampler.greedy(), n_steps=1)
    b = _run(PagedEngine(model, max_streams=2, page_size=8,
                         kv_dtype="int4"),
             device_sampler=DeviceSampler.greedy(), n_steps=4)
    assert a == b


def test_int4_kernel_interpret_matches_xla(model_d128, monkeypatch):
    """Pallas kernel (packed halves, bitcast sign-extension) == jnp
    page-scan pass on kernel-eligible geometry."""

    def run():
        engine = PagedEngine(model_d128, max_streams=2, page_size=16,
                             kv_dtype="int4")
        return _run(engine, prompt="<t2><t3><t4>")

    monkeypatch.setenv("LLM_TPU_KERNELS", "xla")
    ref = run()
    monkeypatch.setenv("LLM_TPU_KERNELS", "interpret")
    got = run()
    assert got == ref


def test_int4_prefix_cache(model):
    """Borrowed pages, CoW tail, and the exact-hit logits path all
    compose with nibble-packed pools (pages are pages)."""
    prompt = "".join(f"<t{i}>" for i in range(2, 17))  # 16 = 2 pages of 8
    ref = _run(PagedEngine(model, max_streams=1, page_size=8,
                           kv_dtype="int4"), prompt=prompt)
    engine = PagedEngine(model, max_streams=1, page_size=8, kv_dtype="int4",
                         n_batch=8, prefix_cache=True)
    assert _run(engine, prompt=prompt) == ref
    assert _run(engine, prompt=prompt) == ref  # exact-hit repeat
    engine.prefix_cache.logits_by_key.clear()
    assert _run(engine, prompt=prompt) == ref  # CoW fallback


def test_int4_engine_snapshot_roundtrip(model, tmp_path):
    from llm_tpu.engine_snapshot import read_engine, write_engine

    engine = PagedEngine(model, max_streams=2, page_size=8, kv_dtype="int4")
    rid = engine.submit(GenerationRequest(
        prompt=PROMPT, max_tokens=8, sampler=DeterministicSampler()))
    for _ in range(4):
        engine.step()
    path = tmp_path / "engine.ckpt"
    write_engine(engine, path)

    resumed = PagedEngine(model, max_streams=2, page_size=8,
                          kv_dtype="int4")
    read_engine(resumed, path)
    while resumed.has_work():
        resumed.step()
    while engine.has_work():
        engine.step()
    assert "".join(resumed.finished[rid].text) == \
        "".join(engine.finished[rid].text)


def test_int4_dense_cache_rejected(model):
    from llm_tpu.serve import Engine

    with pytest.raises(ValueError, match="PAGED pool only"):
        Engine(model, max_streams=2, kv_dtype="int4")
