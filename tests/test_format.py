"""Container IO round-trip tests.

Modeled on the reference's mock-handler round-trip tests
(/root/reference/crates/ggml/src/tests.rs:19-122): write a synthetic file
with random tensors, read it back, compare everything.
"""

import io
import struct

import numpy as np
import pytest

from llm_tpu.ggml.types import ContainerType, GgmlType, data_size
from llm_tpu.ggml.reader import GgmlReader, FormatError
from llm_tpu.ggml.writer import GgmlWriter, SaveError
from llm_tpu.ggml.quant import quantize


def _rand_tensor(rng, t: GgmlType, dims):
    n = int(np.prod(dims))
    x = rng.normal(size=n).astype(np.float32)
    return quantize(t, x)


def _write_file(path, container: ContainerType, scored: bool):
    rng = np.random.default_rng(0)
    hparams = struct.pack("<ii", 3, 7)  # arbitrary model codec payload
    vocab = [(f"tok{i}".encode(), float(i) if scored else 0.0) for i in range(4)]
    tensors = [
        ("weight_a", GgmlType.F32, (64, 2)),
        ("weight_b", GgmlType.Q4_0, (64, 4)),
        ("weight_c", GgmlType.Q8_0, (64, 3)),
    ]
    with open(path, "wb") as f:
        w = GgmlWriter(f, container)
        w.write_header(hparams, vocab)
        datas = {}
        for name, t, dims in tensors:
            raw = _rand_tensor(rng, t, dims)
            datas[name] = (t, dims, raw)
            w.write_tensor(name, t, dims, raw)
    return datas


def _read_hparams(f):
    a, b = struct.unpack("<ii", f.read(8))
    assert (a, b) == (3, 7)
    return (a, b), 4  # n_vocab = 4


@pytest.mark.parametrize(
    "container,scored",
    [
        (ContainerType("ggml"), False),
        (ContainerType("ggjt", 3), True),
    ],
)
def test_roundtrip(tmp_path, container, scored):
    path = tmp_path / "model.bin"
    datas = _write_file(path, container, scored)

    r = GgmlReader(path).load(_read_hparams)
    assert r.container == container
    assert r.vocabulary.tokens == [b"tok0", b"tok1", b"tok2", b"tok3"]
    if scored:
        assert r.vocabulary.scores == [0.0, 1.0, 2.0, 3.0]
    assert set(r.tensors) == set(datas)
    for name, (t, dims, raw) in datas.items():
        info = r.tensors[name]
        assert info.element_type == t
        assert info.dims == tuple(dims)
        if container.aligned_tensors:
            assert info.start_offset % 32 == 0
        assert r.fetch(name).tobytes() == raw


def test_scored_vocab_rejected_on_bare_ggml(tmp_path):
    # saver.rs:96-100
    with open(tmp_path / "x.bin", "wb") as f:
        w = GgmlWriter(f, ContainerType("ggml"))
        with pytest.raises(SaveError):
            w.write_header(b"", [(b"a", 1.0)])


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"\x00\x01\x02\x03" + b"\x00" * 64)
    with pytest.raises(ValueError):
        GgmlReader(p).load(lambda f: (None, 0))


def test_unsupported_version(tmp_path):
    p = tmp_path / "bad.bin"
    buf = io.BytesIO()
    ContainerType("ggjt", 9).write(buf)
    p.write_bytes(buf.getvalue())
    with pytest.raises(FormatError):
        GgmlReader(p).load(lambda f: (None, 0))


def test_q4_row_alignment_check(tmp_path):
    # Q4 tensors require dims[0] % 64 == 0 (format/loader.rs:248-255)
    p = tmp_path / "x.bin"
    with open(p, "wb") as f:
        w = GgmlWriter(f, ContainerType("ggjt", 3))
        w.write_header(b"", [])
        raw = quantize(GgmlType.Q4_0, np.zeros(32, dtype=np.float32))
        w.write_tensor("t", GgmlType.Q4_0, (32,), raw)
    with pytest.raises(FormatError):
        GgmlReader(p).load(lambda f: (None, 0))


def test_model_architecture_string_roundtrip():
    """ModelArchitecture FromStr/Display analog (crates/llm/src/lib.rs:266-279)."""
    from llm_tpu.models.spec import SUPPORTED_ARCHITECTURES, get_arch, UnsupportedModelArchitecture
    import pytest as _pytest

    for name in SUPPORTED_ARCHITECTURES:
        assert get_arch(name).name == name
    assert get_arch("GPT-NeoX").name == "gptneox"
    assert get_arch("Llama").name == "llama"
    with _pytest.raises(UnsupportedModelArchitecture):
        get_arch("not-an-arch")


def test_corrupt_ggjt_load_fails_cleanly(tmp_path):
    """Fuzz of the FULL model-load path over a GGJT checkpoint:
    truncations and header bit-flips must raise the typed error family
    (FormatError / LoadError / ValueError) — never struct.error,
    MemoryError allocation bombs, or hangs. Data-region flips load
    (quant blocks carry no checksum — same contract as the reference,
    format/loader.rs has none either)."""
    import random

    from llm_tpu.loader import LoadError, ModelParameters, load
    from llm_tpu.testing import make_tiny_file

    src = tmp_path / "m.bin"
    make_tiny_file("llama", src)
    data = src.read_bytes()
    rng = random.Random(0)
    p = tmp_path / "fuzz.bin"
    for trial in range(45):
        buf = bytearray(data)
        mode = trial % 3
        if mode == 0:
            buf = buf[: rng.randrange(0, len(buf))]
        elif mode == 1:
            for _ in range(rng.randrange(1, 8)):
                buf[rng.randrange(0, min(len(buf), 512))] = rng.randrange(256)
        else:
            for _ in range(rng.randrange(1, 8)):
                buf[rng.randrange(0, len(buf))] = rng.randrange(256)
        p.write_bytes(bytes(buf))
        try:
            load(p, "llama", params=ModelParameters(context_size=32))
        except (FormatError, LoadError, ValueError):
            pass  # clean typed failure (or the flip was harmless)


def test_truncated_hyperparameters_typed_error(tmp_path):
    """Truncation INSIDE the hyperparameter block raises the typed error
    family, not struct.error (the fuzz seed never drew this cut)."""
    from llm_tpu.loader import LoadError, ModelParameters, load
    from llm_tpu.testing import make_tiny_file

    src = tmp_path / "m.bin"
    make_tiny_file("llama", src)
    data = src.read_bytes()
    p = tmp_path / "cut.bin"
    for cut in (9, 10, 13, 21):  # mid-field cuts inside the hparams
        p.write_bytes(data[:cut])
        with pytest.raises((FormatError, LoadError, ValueError)):
            load(p, "llama", params=ModelParameters(context_size=32))


def test_gpt2_context_clamped_to_wpe_table(tmp_path):
    """learned-position archs cap the runtime context at the checkpoint's
    positional table height (past it the gather would CLAMP to the last
    row and silently degrade every token)."""
    from llm_tpu.loader import ModelParameters, load
    from llm_tpu.testing import make_tiny_file

    p = tmp_path / "g.bin"
    make_tiny_file("gpt2", p)  # file n_ctx = 64
    m = load(p, "gpt2", params=ModelParameters(context_size=2048))
    assert m.spec.n_ctx == 64
    m2 = load(p, "gpt2", params=ModelParameters(context_size=32))
    assert m2.spec.n_ctx == 32  # smaller-than-file stays honored
