"""GGUF v2/v3 container: metadata + tensor index parse, loader integration,
logit equality with the same weights in a classic GGJT container."""

import jax.numpy as jnp
import numpy as np
import pytest

from llm_tpu.ggml.gguf import GgufReader, convert_ggml_to_gguf, is_gguf
from llm_tpu.ggml.types import GgmlType
from llm_tpu.loader import ModelParameters, load
from llm_tpu.testing import make_tiny_file


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("gguf")
    ggjt = d / "llama.bin"
    gguf = d / "llama.gguf"
    make_tiny_file("llama", ggjt)
    convert_ggml_to_gguf(ggjt, gguf, "llama")
    return ggjt, gguf


def test_gguf_magic_and_index(files):
    ggjt, gguf = files
    assert is_gguf(gguf) and not is_gguf(ggjt)
    r = GgufReader(gguf).load("llama")
    assert r.container.kind == "gguf" and r.container.version == 3
    h = r.hyperparameters
    assert h.n_embd == 64 and h.n_layer == 2 and h.n_head == 4
    assert len(r.vocabulary.tokens) == 96
    # names were translated back to the classic GGML names
    assert "tok_embeddings.weight" in r.tensors
    assert "layers.0.attention.wq.weight" in r.tensors
    assert "layers.1.feed_forward.w2.weight" in r.tensors
    # payload identity with the source container
    from llm_tpu.ggml.reader import GgmlReader
    from llm_tpu.models.spec import get_arch

    src = GgmlReader(ggjt).load(
        lambda f: (lambda h: (h, h.n_vocab))(get_arch("llama").read_hparams(f))
    )
    for name in src.tensors:
        np.testing.assert_array_equal(src.fetch(name), r.fetch(name))


def test_gguf_load_logit_parity(files):
    ggjt, gguf = files
    m1 = load(ggjt, "llama", params=ModelParameters(context_size=64))
    m2 = load(gguf, "llama", params=ModelParameters(context_size=64))
    assert m2.container_type.kind == "gguf"

    from llm_tpu.models.forward import forward_step, init_cache

    ids = jnp.asarray([3, 17, 5], jnp.int32)
    l1, _, _ = forward_step(
        m1.spec, m1.params, ids, jnp.int32(0), init_cache(m1.spec, jnp.float32)
    )
    l2, _, _ = forward_step(
        m2.spec, m2.params, ids, jnp.int32(0), init_cache(m2.spec, jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_gguf_quantized_load_and_session(files, tmp_path):
    """Q4_0 GGUF end-to-end through the session API."""
    ggjt = tmp_path / "llama_q4.bin"
    gguf = tmp_path / "llama_q4.gguf"
    make_tiny_file("llama", ggjt, element_type=GgmlType.Q4_0)
    convert_ggml_to_gguf(ggjt, gguf, "llama")

    from llm_tpu.samplers import GreedySampler
    from llm_tpu.session import (
        InferenceParameters,
        InferenceRequest,
        InferenceSession,
    )

    def run(path):
        m = load(path, "llama", params=ModelParameters(context_size=64))
        s = InferenceSession(m)
        out = []
        s.infer(
            InferenceRequest(
                prompt="<t2><t3>",
                parameters=InferenceParameters(sampler=GreedySampler()),
                maximum_token_count=6,
            ),
            rng=np.random.default_rng(0),
            callback=lambda r: out.append(r.text)
            if r.kind == "inferred_token" else None,
        )
        return "".join(out)

    assert run(gguf) == run(ggjt)


def test_gguf_v1_rejected(tmp_path):
    import struct

    p = tmp_path / "old.gguf"
    p.write_bytes(b"GGUF" + struct.pack("<IQQ", 1, 0, 0))
    from llm_tpu.ggml.reader import FormatError

    with pytest.raises(FormatError, match="version"):
        GgufReader(p).load("llama")


@pytest.mark.parametrize(
    "arch", ["gpt2", "gptj", "gptneox", "bloom", "mpt", "falcon"]
)
def test_gguf_all_archs_logit_parity(arch, tmp_path):
    """GGUF name maps cover every architecture: convert a classic
    checkpoint, reload through the GGUF path, logits must be identical —
    and the converted file must use PROPER gguf names (blk.N.*), not
    passthroughs."""
    import jax.numpy as jnp

    ggjt = tmp_path / f"{arch}.bin"
    gguf = tmp_path / f"{arch}.gguf"
    make_tiny_file(arch, ggjt)
    convert_ggml_to_gguf(ggjt, gguf, arch)

    # the reader re-translates, so check the ORIGINAL stored names follow
    # the gguf convention via a raw parse
    import struct as _s

    names = set()
    with open(gguf, "rb") as f:
        f.read(8)
        n_tensors, n_kv = _s.unpack("<QQ", f.read(16))
        from llm_tpu.ggml.gguf import _read_string, _read, _read_value
        for _ in range(n_kv):
            _read_string(f)
            t = _read(f, "<I", 4)
            _read_value(f, t)
        for _ in range(n_tensors):
            names.add(_read_string(f).decode())
            nd = _read(f, "<I", 4)
            f.read(8 * nd + 12)
    assert "token_embd.weight" in names, names
    assert any(n.startswith("blk.0.") for n in names), names
    assert any(n.startswith("blk.1.") for n in names), names

    from llm_tpu.models.forward import forward_step, init_cache

    m1 = load(ggjt, arch, params=ModelParameters(context_size=64))
    m2 = load(gguf, arch, params=ModelParameters(context_size=64))
    ids = jnp.asarray([3, 17, 5], jnp.int32)
    l1, _, _ = forward_step(
        m1.spec, m1.params, ids, jnp.int32(0), init_cache(m1.spec, jnp.float32)
    )
    l2, _, _ = forward_step(
        m2.spec, m2.params, ids, jnp.int32(0), init_cache(m2.spec, jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_gguf_falcon_40b_dual_norm_layout(tmp_path):
    """falcon n_head_kv>1 (40B layout): attn_norm maps to ln_attn and
    attn_norm_2 to ln_mlp, switched on the metadata head_count_kv."""
    import jax.numpy as jnp

    ggjt = tmp_path / "falcon40.bin"
    gguf = tmp_path / "falcon40.gguf"
    make_tiny_file("falcon", ggjt, n_head_kv=2)
    convert_ggml_to_gguf(ggjt, gguf, "falcon")

    r = GgufReader(gguf).load("falcon")
    assert r.hyperparameters.n_head_kv == 2
    assert "transformer.h.0.ln_attn.weight" in r.tensors
    assert "transformer.h.0.ln_mlp.weight" in r.tensors

    from llm_tpu.models.forward import forward_step, init_cache

    m1 = load(ggjt, "falcon", params=ModelParameters(context_size=64))
    m2 = load(gguf, "falcon", params=ModelParameters(context_size=64))
    ids = jnp.asarray([3, 17, 5], jnp.int32)
    l1, _, _ = forward_step(
        m1.spec, m1.params, ids, jnp.int32(0), init_cache(m1.spec, jnp.float32)
    )
    l2, _, _ = forward_step(
        m2.spec, m2.params, ids, jnp.int32(0), init_cache(m2.spec, jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_cli_gguf_convert(tmp_path, capsys):
    from llm_tpu.cli import main

    ggjt = tmp_path / "m.bin"
    gguf = tmp_path / "m.gguf"
    make_tiny_file("llama", ggjt)
    main(["gguf-convert", str(ggjt), str(gguf), "-a", "llama"])
    assert is_gguf(gguf)
    main(["info", "-m", str(gguf), "-a", "llama"])
    out = capsys.readouterr().out
    assert "gguf" in out


def test_quantize_emits_gguf(files, tmp_path):
    """quantize writes GGUF when the destination says so; the GGUF result
    is logit-identical to the classic-container quantization of the same
    source."""
    from llm_tpu.ggml.types import ELEMENT_TYPE_TO_FILE_TYPE
    from llm_tpu.models.forward import forward_step, init_cache
    from llm_tpu.quantize import quantize

    ggjt, _ = files
    dst_gguf = tmp_path / "llama.q4_0.gguf"
    dst_ggjt = tmp_path / "llama.q4_0.bin"
    quantize(ggjt, dst_gguf, "llama", GgmlType.Q4_0)
    quantize(ggjt, dst_ggjt, "llama", GgmlType.Q4_0)
    assert is_gguf(dst_gguf)

    r = GgufReader(dst_gguf).load("llama")
    assert r.metadata["general.file_type"] == int(
        ELEMENT_TYPE_TO_FILE_TYPE[GgmlType.Q4_0]
    )
    assert r.tensors["layers.0.attention.wq.weight"].element_type == GgmlType.Q4_0

    m1 = load(dst_ggjt, "llama", params=ModelParameters(context_size=64))
    m2 = load(dst_gguf, "llama", params=ModelParameters(context_size=64))
    ids = jnp.asarray([3, 17, 5], jnp.int32)
    l1, _, _ = forward_step(
        m1.spec, m1.params, ids, jnp.int32(0), init_cache(m1.spec, jnp.float32)
    )
    l2, _, _ = forward_step(
        m2.spec, m2.params, ids, jnp.int32(0), init_cache(m2.spec, jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_quantize_gguf_to_gguf_metadata_passthrough(files, tmp_path):
    """GGUF -> GGUF quantize: every metadata key except general.file_type
    passes through verbatim and tensors keep their original GGUF names
    (llama.cpp quantize behavior)."""
    from llm_tpu.ggml.types import ELEMENT_TYPE_TO_FILE_TYPE
    from llm_tpu.quantize import quantize

    _, gguf = files
    dst = tmp_path / "llama.q5_1.gguf"
    quantize(gguf, dst, "llama", GgmlType.Q5_1)

    src = GgufReader(gguf).load("llama")
    out = GgufReader(dst).load("llama")
    md_src, md_out = dict(src.metadata), dict(out.metadata)
    assert md_out.pop("general.file_type") == int(
        ELEMENT_TYPE_TO_FILE_TYPE[GgmlType.Q5_1]
    )
    md_src.pop("general.file_type")
    assert md_src == md_out
    assert set(out.source_names.values()) == set(src.source_names.values())
    assert "blk.0.attn_q.weight" in out.source_names.values()

    model = load(dst, "llama", params=ModelParameters(context_size=64))
    assert model.container_type.kind == "gguf"


def test_quantize_gguf_to_classic(files, tmp_path):
    """GGUF source -> classic GGJT destination."""
    from llm_tpu.models.forward import forward_step, init_cache
    from llm_tpu.quantize import quantize

    ggjt, gguf = files
    dst = tmp_path / "back.bin"
    ref = tmp_path / "ref.bin"
    quantize(gguf, dst, "llama", GgmlType.Q8_0)
    quantize(ggjt, ref, "llama", GgmlType.Q8_0)
    m1 = load(dst, "llama", params=ModelParameters(context_size=64))
    m2 = load(ref, "llama", params=ModelParameters(context_size=64))
    ids = jnp.asarray([3, 17, 5], jnp.int32)
    l1, _, _ = forward_step(
        m1.spec, m1.params, ids, jnp.int32(0), init_cache(m1.spec, jnp.float32)
    )
    l2, _, _ = forward_step(
        m2.spec, m2.params, ids, jnp.int32(0), init_cache(m2.spec, jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_cli_quantize_gguf_destination(tmp_path, capsys):
    from llm_tpu.cli import main

    src = tmp_path / "m.bin"
    dst = tmp_path / "m.q4_0.gguf"
    make_tiny_file("llama", src)
    main(["quantize", str(src), str(dst), "q4_0", "-a", "llama"])
    assert is_gguf(dst)
    main(["info", "-m", str(dst), "-a", "llama"])
    assert "q4_0" in capsys.readouterr().out.lower()


def test_gguf_conversion_standard_metadata(files):
    """Conversion records the standard GGUF keys real consumers need:
    tokenizer model, eos id, feed_forward_length (not derivable from n_mult
    for every geometry)."""
    _, gguf = files
    md = GgufReader(gguf).load("llama").metadata
    assert md["tokenizer.ggml.model"] == b"llama"
    assert md["llama.feed_forward_length"] > 0
    # the tiny vocab's token 0 is </s> (llm_tpu.testing), so eos id == 0
    assert md["tokenizer.ggml.eos_token_id"] == 0


def test_gguf_rope_metadata_applies_to_spec(tmp_path):
    """rope.freq_base / rope.scale_linear in the checkpoint metadata reach
    the model spec (CodeLlama-style long-rope files); CLI overrides win."""
    from llm_tpu.ggml.gguf import GgufReader, GgufWriter
    import shutil

    d = tmp_path
    ggjt = d / "llama.bin"
    gguf = d / "llama.gguf"
    make_tiny_file("llama", ggjt)
    convert_ggml_to_gguf(ggjt, gguf, "llama")

    # rewrite with rope keys injected
    r = GgufReader(gguf).load("llama")
    out = d / "rope.gguf"
    with open(out, "wb") as f:
        w = GgufWriter(f)
        for k, v in r.metadata.items():
            if k != "general.alignment":
                w.add_metadata(k, v)
        w.add_metadata("llama.rope.freq_base", 1e6)
        w.add_metadata("llama.rope.scale_linear", 4.0)
        for name, info in r.tensors.items():
            from llm_tpu.ggml.gguf import gguf_name_fn

            to_gguf = gguf_name_fn("llama")
            w.add_tensor(
                to_gguf(name), info.element_type, info.dims,
                bytes(r.fetch(name)),
            )
        w.finish()

    m = load(out, "llama", params=ModelParameters(context_size=64))
    assert m.spec.rope_freq_base == 1e6
    assert m.spec.rope_freq_scale == 0.25  # 1 / scale_linear

    from llm_tpu.loader import RoPEOverrides

    m2 = load(
        out, "llama",
        params=ModelParameters(
            context_size=64,
            rope_overrides=RoPEOverrides(frequency_base=5e5,
                                         frequency_scale=0.5),
        ),
    )
    assert m2.spec.rope_freq_base == 5e5 and m2.spec.rope_freq_scale == 0.5


def test_gguf_convert_merges_from_tokenizer_json(tmp_path):
    import json

    ggjt = tmp_path / "gpt2.bin"
    gguf = tmp_path / "gpt2.gguf"
    make_tiny_file("gpt2", ggjt)
    tj = tmp_path / "tokenizer.json"
    tj.write_text(json.dumps(
        {"model": {"type": "BPE", "merges": ["a b", ["ab", "c"]]}}
    ))
    convert_ggml_to_gguf(ggjt, gguf, "gpt2", tokenizer_json=tj)
    md = GgufReader(gguf).load("gpt2").metadata
    assert md["tokenizer.ggml.model"] == b"gpt2"
    assert md["tokenizer.ggml.merges"] == [b"a b", b"ab c"]


def test_gguf_convert_embeds_chat_template(tmp_path):
    """gguf-convert --chat-template -> tokenizer.chat_template metadata ->
    Model.chat_template -> chat rendering."""
    from llm_tpu.cli import main
    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.server import render_chat
    from llm_tpu.testing import make_tiny_file

    src = tmp_path / "m.bin"
    make_tiny_file("llama", src)
    dst = tmp_path / "m.gguf"
    tmpl = "{% for m in messages %}<t2>{{ m.content }}{% endfor %}<t3>"
    main(["gguf-convert", str(src), str(dst), "-a", "llama",
          "--chat-template", tmpl])
    m = load(dst, "llama", params=ModelParameters(context_size=32))
    assert m.chat_template == tmpl
    prompt, _ = render_chat(
        [{"role": "user", "content": "<t5>"}], None, m.chat_template
    )
    assert prompt == "<t2><t5><t3>"


def test_corrupt_gguf_fails_cleanly(tmp_path):
    """Counts and lengths in a GGUF header are untrusted: any corruption
    (truncation, bit flips in the header or body) must raise a clean
    typed error — never a MemoryError allocation bomb from a forged
    2^60 string/array length, an OverflowError, or a near-infinite
    parse loop (seeded sample of the fuzz that originally found both)."""
    import random

    from llm_tpu.ggml.gguf import FormatError, convert_ggml_to_gguf

    src = tmp_path / "m.bin"
    make_tiny_file("llama", src)
    gguf = tmp_path / "m.gguf"
    convert_ggml_to_gguf(src, gguf, "llama")
    data = gguf.read_bytes()

    rng = random.Random(0)
    p = tmp_path / "fuzz.gguf"
    for trial in range(60):
        buf = bytearray(data)
        mode = trial % 3
        if mode == 0:
            buf = buf[: rng.randrange(0, len(buf))]
        elif mode == 1:
            for _ in range(rng.randrange(1, 8)):
                i = rng.randrange(0, min(len(buf), 512))
                buf[i] = rng.randrange(256)
        else:
            for _ in range(rng.randrange(1, 8)):
                i = rng.randrange(0, len(buf))
                buf[i] = rng.randrange(256)
        p.write_bytes(bytes(buf))
        try:
            GgufReader(p).load("llama")
        except (FormatError, ValueError, KeyError):
            pass  # clean typed failure (or the flip was harmless)


def _rewrite_gguf(src_gguf, out, extra_md=(), drop_tail_bytes=0):
    """Re-emit a GGUF with extra metadata (and optionally truncate)."""
    from llm_tpu.ggml.gguf import GgufReader, GgufWriter, gguf_name_fn

    r = GgufReader(src_gguf).load("llama")
    to_gguf = gguf_name_fn("llama")
    with open(out, "wb") as f:
        w = GgufWriter(f)
        for k, v in r.metadata.items():
            if k != "general.alignment":
                w.add_metadata(k, v)
        for k, v in extra_md:
            w.add_metadata(k, v)
        for name, info in r.tensors.items():
            w.add_tensor(to_gguf(name), info.element_type, info.dims,
                         bytes(r.fetch(name)))
        w.finish()
    if drop_tail_bytes:
        data = out.read_bytes()
        out.write_bytes(data[:-drop_tail_bytes])


def test_rope_scaling_type_bytes(tmp_path):
    """GGUF strings decode to BYTES; a llama.cpp-style
    rope.scaling.type="linear" + scaling.factor must still apply (it was
    silently dropped by a str comparison — advisor r4)."""
    from llm_tpu.ggml.gguf import GgufReader, convert_ggml_to_gguf

    ggjt = tmp_path / "m.bin"
    make_tiny_file("llama", ggjt)
    base = tmp_path / "m.gguf"
    convert_ggml_to_gguf(ggjt, base, "llama")
    out = tmp_path / "scaled.gguf"
    _rewrite_gguf(base, out, extra_md=[
        ("llama.rope.scaling.type", "linear"),
        ("llama.rope.scaling.factor", 4.0),
    ])
    r = GgufReader(out).load("llama")
    assert isinstance(r.metadata["llama.rope.scaling.type"], bytes)
    assert r.hyperparameters.rope_freq_scale == 0.25


def test_gguf_truncated_data_region_fetch_raises(tmp_path):
    """Tensor offsets/sizes are untrusted: a file truncated mid-data must
    raise FormatError from fetch(), never hand a SHORT buffer to the
    native transcoder (out-of-bounds C reads)."""
    from llm_tpu.ggml.gguf import FormatError, GgufReader, convert_ggml_to_gguf

    ggjt = tmp_path / "m.bin"
    make_tiny_file("llama", ggjt)
    base = tmp_path / "m.gguf"
    convert_ggml_to_gguf(ggjt, base, "llama")
    out = tmp_path / "short.gguf"
    _rewrite_gguf(base, out, drop_tail_bytes=64)
    r = GgufReader(out).load("llama")  # header parses fine
    last = max(r.tensors, key=lambda n: r.tensors[n].start_offset)
    with pytest.raises(FormatError, match="exceeds"):
        r.fetch(last)


def test_gguf_writer_rejects_foreign_alignment(tmp_path):
    """GgufWriter pads with ALIGN=32; declaring a different
    general.alignment would shift the data section for conforming
    readers — reject instead of writing a broken file."""
    from llm_tpu.ggml.gguf import GgufWriter, SaveError

    with open(tmp_path / "x.gguf", "wb") as f:
        w = GgufWriter(f)
        w.add_metadata("general.architecture", "llama")
        w.add_metadata("general.alignment", 64)
        with pytest.raises(SaveError, match="alignment"):
            w.finish()


def test_gguf_zero_alignment_clean_error(tmp_path):
    """general.alignment=0 in a corrupt header must be a FormatError, not
    ZeroDivisionError."""
    import io
    import struct as _s

    from llm_tpu.ggml.gguf import GGUF_MAGIC, FormatError, GgufReader, \
        _w_string, _w_value

    buf = io.BytesIO()
    buf.write(GGUF_MAGIC)
    buf.write(_s.pack("<IQQ", 3, 0, 2))  # v3, 0 tensors, 2 kv
    _w_string(buf, b"general.architecture")
    _w_value(buf, "llama")
    _w_string(buf, b"general.alignment")
    _w_value(buf, 0)
    p = tmp_path / "zero.gguf"
    p.write_bytes(buf.getvalue())
    with pytest.raises(FormatError, match="alignment"):
        GgufReader(p).load("llama")


def test_container_truncated_magic_typed_error(tmp_path):
    """0-7 byte files raise the typed magic error, not struct.error."""
    from llm_tpu.ggml.reader import GgmlReader
    from llm_tpu.ggml.types import FormatMagicError

    for n in (0, 3, 5):  # short magic and short version reads
        p = tmp_path / f"tiny{n}.bin"
        p.write_bytes(b"\x67\x67\x6a\x74"[:n])  # ggjt magic prefix
        with pytest.raises((FormatMagicError, ValueError)):
            GgmlReader(p).load(lambda f: (None, 0))
    p = tmp_path / "magic_only.bin"
    p.write_bytes(bytes.fromhex("67676a74"))  # full magic, no version
    with pytest.raises((FormatMagicError, ValueError)):
        GgmlReader(p).load(lambda f: (None, 0))
