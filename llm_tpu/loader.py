"""Model-level loading: GGML file -> ready-to-run Model.

The analog of llm-base's `load::<M>()` orchestration
(/root/reference/crates/llm-base/src/loader.rs:419-567):

    find multipart -> tokenizer retrieve -> container parse (hparams, vocab,
    tensor index) -> quantization-version check -> LoRA preload -> pack
    tensors to device -> Model

Progress reporting mirrors the LoadProgress callback enum (loader.rs:181-210).
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from llm_tpu.ggml.reader import GgmlReader
from llm_tpu.ggml.types import ContainerType
from llm_tpu.lora import LoraAdapter
from llm_tpu.models.params import ModelParams, WeightSource, build_params
from llm_tpu.models.spec import (
    ArchInfo,
    Hyperparameters,
    ModelSpec,
    get_arch,
    with_runtime_params,
)
from llm_tpu.tokenizer import Tokenizer, TokenizerSource


class LoadError(Exception):
    pass


class MultipartNotSupported(LoadError):
    def __init__(self, paths):
        super().__init__(
            "Multipart models are not supported. Please convert the model to "
            f"a single part: {paths}"
        )


@dataclass
class RoPEOverrides:
    """ggml rope_custom overrides (crates/ggml/src/lib.rs:134-152)."""

    frequency_scale: float = 1.0
    frequency_base: int = 10000


@dataclass
class ModelParameters:
    """Runtime load parameters (crates/llm-base/src/model/mod.rs:196-229).

    GPU fields from the reference are obsolete on TPU (weights always live
    in HBM); they are accepted for CLI parity and ignored.
    """

    prefer_mmap: bool = True
    context_size: int = 2048
    lora_adapters: Optional[Sequence[str]] = None
    use_gpu: bool = True
    gpu_layers: Optional[int] = None
    rope_overrides: Optional[RoPEOverrides] = None
    n_gqa: Optional[int] = None
    # TPU-specific:
    kv_dtype: jnp.dtype = jnp.bfloat16


@dataclass
class LoadProgress:
    """One progress event; kind in {hyperparameters_loaded, context_size,
    lora_applied, tensor_loaded, loaded} (loader.rs:181-210)."""

    kind: str
    current: int = 0
    total: int = 0
    byte_size: int = 0


ProgressCallback = Callable[[LoadProgress], None]


def find_all_model_files(path: Path) -> list[Path]:
    """Reject multipart models (util.rs:91-135: collect_related_paths)."""
    path = Path(path)
    related = []
    stem = path.name
    for sib in sorted(path.parent.glob(f"{stem}.*")):
        if re.fullmatch(r"\d+", sib.suffix.lstrip(".")):
            related.append(sib)
    if related:
        raise MultipartNotSupported([path, *related])
    return [path]


_GGUF_BYTE_TOKEN = re.compile(rb"^<0x([0-9A-Fa-f]{2})>$")


def _gguf_sp_token_bytes(tok: bytes) -> bytes:
    """GGUF SentencePiece surface form -> raw bytes: '▁' (U+2581) is the
    word boundary (space), '<0xNN>' tokens are single bytes."""
    m = _GGUF_BYTE_TOKEN.match(tok)
    if m:
        return bytes([int(m.group(1), 16)])
    return tok.replace("▁".encode(), b" ")


class Model:
    """A loaded model: static spec + packed device params + tokenizer.

    Immutable after construction (the reference's Model: Send+Sync contract,
    model/mod.rs:268-277); any number of sessions may share it.
    """

    chat_template = None  # GGUF tokenizer.chat_template (HF jinja), if any

    def __init__(
        self,
        arch: ArchInfo,
        hyperparameters: Hyperparameters,
        spec: ModelSpec,
        params: ModelParams,
        tokenizer: Tokenizer,
        model_parameters: ModelParameters,
        container_type: ContainerType,
    ):
        self.arch = arch
        self.hyperparameters = hyperparameters
        self.spec = spec
        self.params = params
        self.tokenizer = tokenizer
        self.model_parameters = model_parameters
        self.container_type = container_type

    @property
    def context_size(self) -> int:
        return self.spec.n_ctx

    @property
    def supports_rewind(self) -> bool:
        return self.arch.supports_rewind

    def bot_token_id(self) -> Optional[int]:
        if self.arch.bot_token is None:
            return None
        return self.tokenizer.id(self.arch.bot_token.encode())

    def eot_token_id(self) -> int:
        tid = self.tokenizer.id(self.arch.eot_token.encode())
        if tid is None:
            if self.arch.eot_fallback_id is not None:
                return self.arch.eot_fallback_id
            raise LoadError(f"tokenizer has no {self.arch.eot_token!r} token")
        return tid

    def start_session(self, config=None):
        from llm_tpu.session import InferenceSession, InferenceSessionConfig

        return InferenceSession(self, config or InferenceSessionConfig())


def load(
    path: str | Path,
    architecture: str,
    tokenizer_source: Optional[TokenizerSource] = None,
    params: Optional[ModelParameters] = None,
    progress: Optional[ProgressCallback] = None,
) -> Model:
    """Load a GGML-family model file for the named architecture."""
    path = Path(path)
    params = params or ModelParameters()
    progress = progress or (lambda ev: None)
    arch = get_arch(architecture)

    find_all_model_files(path)

    tokenizer_source = tokenizer_source or TokenizerSource.embedded()
    external_tokenizer = tokenizer_source.retrieve()

    from llm_tpu.ggml.gguf import GgufReader, is_gguf

    if is_gguf(path):
        # GGUF successor container: hyperparameters come from the metadata
        # KV store and tensor names are translated to the classic GGML
        # names at index time (ggml/gguf.py)
        reader = GgufReader(path).load(architecture)
    else:
        reader = GgmlReader(path).load(
            lambda f: (lambda h: (h, h.n_vocab))(arch.read_hparams(f))
        )
    hp: Hyperparameters = reader.hyperparameters
    progress(LoadProgress("hyperparameters_loaded"))

    # quantization-version guess + assertion (loader.rs:459-484)
    qv = hp.file_type.quantization_version
    if qv == 0:
        if reader.container == ContainerType("ggjt", 2):
            qv = 1
        elif reader.container == ContainerType("ggjt", 3):
            qv = 2
    if any(t.element_type.is_quantized for t in reader.tensors.values()):
        if qv != 2:
            raise LoadError(
                f"quantization version must be 2, got {qv} "
                "(requantize this model with a current converter)"
            )

    if external_tokenizer is not None:
        tokenizer = external_tokenizer
    else:
        md = getattr(reader, "metadata", {}) or {}
        tok_model = md.get("tokenizer.ggml.model")
        merges = md.get("tokenizer.ggml.merges")
        if tok_model in (b"gpt2", "gpt2") and merges:
            # GGUF BPE vocab (mapped-form tokens + ranked merges): the
            # scores are meaningless, so score-greedy would mis-tokenize
            from llm_tpu.tokenizer.bpe import BpeTokenizer

            bos = md.get("tokenizer.ggml.bos_token_id")
            tokenizer = Tokenizer(
                BpeTokenizer(
                    reader.vocabulary.tokens,
                    merges,
                    token_types=md.get("tokenizer.ggml.token_type"),
                    bos_id=int(bos) if bos is not None else None,
                )
            )
        else:
            from llm_tpu.tokenizer.embedded import EmbeddedTokenizer

            toks = reader.vocabulary.tokens
            if "tokenizer.ggml.tokens" in md:
                # GGUF stores SentencePiece SURFACE forms ('▁hello',
                # literal '<0xNN>' byte tokens); the embedded tokenizer is
                # byte-oriented, so map them here (classic containers
                # already store raw bytes). Control tokens (type 3) keep
                # their verbatim text. The reader's vocabulary is left
                # untouched so GGUF→GGUF rewrites pass surface forms through.
                types = md.get("tokenizer.ggml.token_type") or []
                toks = [
                    _gguf_sp_token_bytes(t)
                    if (i >= len(types) or types[i] != 3)
                    else t
                    for i, t in enumerate(toks)
                ]
            emb = EmbeddedTokenizer()
            for i, (tok, score) in enumerate(
                zip(toks, reader.vocabulary.scores)
            ):
                emb.push_token(i, tok, score)
            tokenizer = Tokenizer(emb)

    lora_adapters = [LoraAdapter(p) for p in (params.lora_adapters or [])]

    total_bytes = sum(t.calc_size() for t in reader.tensors.values())
    progress(LoadProgress("context_size", byte_size=total_bytes))

    spec = with_runtime_params(
        arch.make_spec(hp),
        context_size=params.context_size,
        n_gqa=params.n_gqa,
        rope_freq_base=(
            float(params.rope_overrides.frequency_base)
            if params.rope_overrides
            else hp.rope_freq_base  # GGUF metadata (None for classic GGML)
        ),
        rope_freq_scale=(
            params.rope_overrides.frequency_scale
            if params.rope_overrides
            else hp.rope_freq_scale
        ),
    )
    if params.n_gqa is not None and spec.arch == "llama":
        hp.n_head_kv = spec.n_head_kv
    if spec.learned_pos:
        # learned positional embeddings (gpt2/bloom wpe) physically cap
        # the context at the checkpoint's table height: past it, the
        # position gather would CLAMP to the last row and silently
        # degrade every token (JAX out-of-bounds gather semantics)
        file_ctx = getattr(hp, "n_ctx", 0) or 0
        if file_ctx and spec.n_ctx > file_ctx:
            spec = with_runtime_params(spec, context_size=file_ctx)

    def tensor_progress(name: str, current: int, total: int) -> None:
        progress(LoadProgress("tensor_loaded", current=current, total=total))

    # pre-packed plane cache (cli `pack`): skip transcode when a valid
    # cache sits next to the file; LoRA loads bypass it (patched planes);
    # LLM_TPU_PACK_CACHE=0 disables (e.g. to time the cold path)
    import os as _os

    device_params = None
    if not lora_adapters and _os.environ.get("LLM_TPU_PACK_CACHE") != "0":
        from llm_tpu.models.pack_cache import (
            cache_key,
            load_packed_params,
            pack_path,
        )

        pp = pack_path(path)
        if pp.exists():
            device_params = load_packed_params(
                pp, cache_key(path, n_gqa=params.n_gqa)
            )
    if device_params is None:
        ws = WeightSource(
            reader, progress=tensor_progress, lora_adapters=lora_adapters
        )
        device_params = build_params(ws, spec)

    progress(LoadProgress("loaded", byte_size=total_bytes))

    model = Model(
        arch=arch,
        hyperparameters=hp,
        spec=spec,
        params=device_params,
        tokenizer=tokenizer,
        model_parameters=params,
        container_type=reader.container,
    )
    # GGUF checkpoints may carry the HF-convention jinja chat template
    # (tokenizer.chat_template); the serving chat endpoint renders with it
    tmpl = (getattr(reader, "metadata", {}) or {}).get(
        "tokenizer.chat_template"
    )
    if isinstance(tmpl, bytes):
        tmpl = tmpl.decode("utf-8", errors="replace")
    model.chat_template = tmpl
    return model
