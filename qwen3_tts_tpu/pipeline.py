"""Qwen3TTS facade: load -> prefill -> jitted generation -> vocoder decode.

The public surface mirrors the reference's ``Qwen3TTS`` (src/lib.rs:154-1411):
``from_pretrained`` with variant auto-detection, ``synthesize``/
``synthesize_with_voice``/``synthesize_voice_design``/``synthesize_voice_clone``,
``create_voice_clone_prompt``, ``synthesize_streaming`` (StreamingSession),
``SynthesisOptions`` and ``SynthesisTiming`` — re-architected around three
jitted XLA programs:

  1. prefill + first-token sampling (per prompt-length bucket),
  2. the while_loop frame generator (per max-frames bucket) — zero host syncs,
  3. the vocoder decode (per frame-count bucket).

Prompt lengths, text lengths, and frame budgets are bucketed so steady-state
synthesis never recompiles; padding is exact by construction (causal masks /
causal convs).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, replace
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .audio.io import AudioBuffer
from .audio.resample import resample_to_24k
from .generation import core, prefill
from .models import talker as talker_model
from .models import tokens as T
from .models import weights as W
from .models.codec import vocoder
from .models.config import (
    ModelConfig,
    ModelType,
    config_for_variant,
    parse_config_json,
)
from .ops import nn, rng, sampling
from .tokenizer import TextTokenizer
from .utils import compile_cache
from .utils.bucketing import next_bucket

logger = logging.getLogger("qwen3_tts_tpu")

# Persistent XLA compile cache: the large fused programs compile once per
# machine, not once per process.
compile_cache.enable()

FRAME_BUCKETS = (64, 128, 256, 512, 1024, 2048)
TEXT_BUCKET = 32
DECODE_BUCKET = 64
# Sessions start with this frame capacity and grow through FRAME_BUCKETS at
# segment boundaries (journal R2.2: in-loop window switching measured slower;
# growing the donated buffers between loop re-entries keeps every program
# branch-free while attention cost tracks the live tier).
GROWTH_INITIAL_FRAMES = 256


@dataclass(frozen=True)
class SynthesisOptions:
    """Generation options; defaults match the reference (src/lib.rs:1822-1836)."""

    max_length: int = 2048
    temperature: float = 0.9
    top_k: int = 50
    top_p: float = 0.9
    repetition_penalty: float = 1.05
    eos_token_id: int = T.CODEC_EOS
    chunk_frames: int = 10
    # Streaming: generate only this many frames before emitting the FIRST
    # chunk (then fall back to chunk_frames). 4 frames = 320 ms of audio
    # yet only ~4 frame-times of latency, cutting TTFA by ~6 frame-times vs
    # chunk_frames=10 with no underrun risk (steady-state generation is
    # ~10-25x faster than realtime). None = use chunk_frames.
    first_chunk_frames: int | None = 4
    min_new_tokens: int = 2
    seed: int | None = None
    # ICL prompt layout: False = element-wise overlay (official Python
    # streaming default), True = sequential [text || codec] blocks (the
    # mlx-audio non-streaming variant, talker.rs:674-689).
    icl_sequential: bool = False
    # Sample-exact streaming: carry vocoder state (pre_conv context +
    # pre-transformer KV + conv-stack margin) across chunks so streamed audio
    # is identical to one-shot batch decode — beyond the reference, whose
    # chunked decode only achieves frame-count parity
    # (tests/streaming_e2e.rs:150-157). False = legacy chunk-local context
    # (the reference behavior; marginally cheaper per chunk).
    streaming_exact: bool = True
    # Chunks to keep speculatively in flight AHEAD of the chunk being
    # fetched in next_chunk(): the device advances chunk k+1 while the host
    # fetches/plays chunk k, hiding the per-chunk dispatch+fetch round trip
    # (~30 ms through a remote-TPU tunnel; one launch latency locally).
    # Programs dispatched past EOS no-op their while_loop and are discarded.
    # 0 = strictly serial dispatch->fetch (the pre-R3.6 behavior).
    streaming_lookahead: int = 1

    def sampling_config(self) -> sampling.SamplingConfig:
        return sampling.SamplingConfig(
            temperature=self.temperature,
            top_k=self.top_k,
            top_p=self.top_p,
            repetition_penalty=self.repetition_penalty,
            eos_token_id=self.eos_token_id,
            min_new_tokens=self.min_new_tokens,
        )


@dataclass
class SynthesisTiming:
    prefill_ms: float = 0.0
    generation_ms: float = 0.0
    generation_frames: int = 0
    decode_ms: float = 0.0


@dataclass
class VoiceClonePrompt:
    """Reference-audio conditioning (x-vector, plus ICL codes/text if given)."""

    speaker_embedding: np.ndarray  # [enc_dim] float32
    ref_codes: np.ndarray | None = None  # [T, 16] int32 (ICL mode)
    ref_text_ids: list[int] | None = None  # tokenized reference text (ICL mode)


# ICL-mode generation overrides (src/lib.rs:1472-1478).
ICL_MIN_FRAMES = 75
ICL_FRAMES_PER_TOKEN = 6
ICL_MIN_REPETITION_PENALTY = 1.5


def _sidecar_config(path: Path, cls):
    """Load a dataclass config from a JSON sidecar file, or None if absent.

    Unknown keys are rejected (typo safety); JSON lists are coerced to
    tuples where the dataclass default is a tuple (e.g. Mimi ratios).
    """
    if not path.exists():
        return None
    import dataclasses
    import json as _json

    data = _json.loads(path.read_text())
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise ValueError(f"{path}: unknown {cls.__name__} fields {sorted(unknown)}")
    coerced = {
        k: tuple(v) if isinstance(v, list) else v for k, v in data.items()
    }
    logger.info("Loaded %s override from %s", cls.__name__, path)
    return cls(**coerced)


class Qwen3TTS:
    """End-to-end TTS pipeline on TPU."""

    def __init__(
        self,
        config: ModelConfig,
        talker_params: dict,
        cp_params: dict,
        vocoder_params: dict,
        tokenizer: TextTokenizer | None,
        speaker_encoder=None,
        speech_encoder=None,
        vocoder_config: vocoder.VocoderConfig = vocoder.VocoderConfig(),
        fuse_projections: bool = False,
        quantize_int8: bool = False,
        int8_activations: bool = False,
    ):
        self.config = config
        # w8a8: batched programs quantize activations per token and run
        # int8 x int8 MXU dots, removing the dequant-cast VPU cost that
        # keeps batched int8 decode at ~2x the weight-read bound (journal
        # R4.9). Lossy (activation rounding) — strictly opt-in, batch paths
        # only; solo decode keeps the bit-stable weight-only kernels.
        self.w8a8 = bool(int8_activations and quantize_int8)
        if int8_activations and not quantize_int8:
            raise ValueError("int8_activations requires quantize_int8=True")
        if fuse_projections:
            # Optional QKV / gate-up fusion. Measured NEUTRAL-to-slightly-slower
            # on TPU v5e (8.48 -> 8.67 ms/frame at 1.7B): inside one compiled
            # loop XLA already pipelines the separate dots, so there is no
            # launch overhead to save. Kept for experimentation on other
            # topologies.
            talker_params = W.fuse_model_params(talker_params)
            cp_params = W.fuse_model_params(cp_params)
        if quantize_int8:
            # Experimental weight-only int8 (Pallas dequant matmul): halves
            # the HBM weight traffic in the bandwidth-bound frame loop.
            # Measured on v5e at 1.7B: 8.48 -> 7.4 ms/frame with fused
            # projections (fewer, larger kernel invocations — per-call
            # overhead otherwise eats the bandwidth win in the CP's many
            # small steps). Near-lossless on transformer weights in general,
            # but validate audio quality per checkpoint (ops/quant.py).
            from .ops import quant as Q

            if not fuse_projections:
                talker_params = W.fuse_model_params(talker_params)
                cp_params = W.fuse_model_params(cp_params)
            talker_params = Q.quantize_talker_params(talker_params)
            cp_params = Q.quantize_code_predictor_params(cp_params)
            # One-time re-layout of the weights into HBM stream tiles for the
            # whole-step streaming kernels (ops/fused_layer.py, journal
            # R2.3/R2.4). Costs one extra int8 copy of each stack in HBM.
            from .ops import fused_layer as FL

            pack = FL.make_stream_pack(
                cp_params["layers"], config.code_predictor.layer_stack()
            )
            if pack is not None:
                cp_params["stream_pack"] = pack
            tpack = FL.make_stream_pack(
                talker_params["layers"], config.talker.layer_stack()
            )
            if tpack is not None:
                talker_params["stream_pack"] = tpack
        else:
            from .ops import fused_layer as _FL

            # The CP whole-frame kernel pays in bf16 too (journal R2.8):
            # as many of the 5 layers as fit CP_WRES_BUDGET stay resident
            # in VMEM across the 15 inner steps, cutting CP weight
            # re-streaming and removing the inter-step XLA glue. TPU-only
            # by default (the interpret-mode kernel is slow on CPU and its
            # row-split prefill rounds differently at f32);
            # QWEN3_TTS_NO_CP_STREAM=1 disables.
            if not _FL._interpret() and not os.environ.get("QWEN3_TTS_NO_CP_STREAM"):
                cpack = _FL.make_stream_pack(
                    W.fuse_model_params(cp_params)["layers"],
                    config.code_predictor.layer_stack(),
                )
                if cpack is not None:
                    cp_params = dict(cp_params)
                    cp_params["stream_pack"] = cpack
        if not quantize_int8 and os.environ.get("QWEN3_TTS_BF16_STREAM_PACK"):
            # Opt-in only: the bf16 streaming talker kernel measured NEUTRAL
            # vs the XLA layer scan (journal R2.7: 7.92 vs 7.99 ms/frame at
            # the 128-frame tier, 9.27 vs ~9.2 at 2048 frames) — XLA already
            # overlaps bf16 weight streaming with compute; the custom-call
            # serialization the kernel fixes is int8-specific. Kept for
            # experimentation on other topologies at the cost of a 2x-weights
            # HBM re-layout. Canonical unfused tree stays authoritative.
            from .ops import fused_layer as FL

            tpack = FL.make_stream_pack(
                W.fuse_model_params(talker_params)["layers"],
                config.talker.layer_stack(),
            )
            if tpack is not None:
                talker_params = dict(talker_params)
                talker_params["stream_pack"] = tpack
        self.talker_params = talker_params
        self.cp_params = cp_params
        # Activation compute dtype (norm weights are never quantized).
        self.compute_dtype = talker_params["norm"].dtype
        self.vocoder_params = vocoder_params
        self.vocoder_config = vocoder_config
        self.tokenizer = tokenizer
        self.speaker_encoder = speaker_encoder
        self.speech_encoder = speech_encoder
        # Multi-chip serving mesh (None = single device). Set via shard().
        self.mesh = None

    # ------------------------------------------------------------------
    # Multi-chip sharding
    # ------------------------------------------------------------------

    def shard(self, mesh) -> "Qwen3TTS":
        """Place the model onto a ``jax.sharding.Mesh`` for tp/dp serving.

        Tensor-parallel weight placement (parallel/sharding.py specs: heads /
        MLP intermediate / vocab on ``tp``; norms and embeddings replicated)
        plus replication of the f32 vocoder. KV caches created afterwards are
        sharded over KV heads on tp (``serving_cache_spec``); XLA/GSPMD
        inserts the psums on the row-parallel matmuls. ``synthesize_batch``
        additionally shards the utterance batch over ``dp``.

        The single-chip whole-step stream kernels (manual-DMA custom calls
        with an in-kernel residual chain) cannot span chips, so their packs
        are dropped; int8 models get a head-aligned ``tp_pack`` re-layout
        instead and the talker decode steps run per-chip fused kernels under
        shard_map with psums between sub-layers
        (ops/fused_layer.tp_decode_step). The Pallas dequant matmul is
        scoped off per sharded program (ops/quant.pallas_dequant_scope) —
        single-chip int8 models in the same process keep their kernels.
        New design beyond the reference, which is strictly single-device
        (src/lib.rs:169-172, SURVEY §2.3). Returns self.
        """
        from .ops import fused_layer as FL
        from .parallel import sharding as S

        for tree in (self.talker_params, self.cp_params):
            if tree.pop("stream_pack", None) is not None:
                logger.info(
                    "shard(): dropping single-chip stream pack; multi-chip "
                    "talker decode uses the per-chip tp kernels."
                )
        tp = mesh.shape.get("tp", 1)
        if tp > 1:
            tpack = FL.make_tp_pack(
                self.talker_params["layers"], self.config.talker.layer_stack(), tp
            )
            if tpack is not None:
                self.talker_params = dict(self.talker_params)
                self.talker_params["tp_pack"] = tpack
                logger.info(
                    "shard(): int8 talker — per-chip tp kernels enabled "
                    "(head-aligned qkv/gateup re-layout, tp=%d).", tp
                )
        self.talker_params = S.shard_pytree(
            self.talker_params,
            S.talker_specs(self.config.talker, self.talker_params),
            mesh,
        )
        self.cp_params = S.shard_pytree(
            self.cp_params,
            S.code_predictor_specs(self.config.code_predictor, self.cp_params),
            mesh,
        )
        self.vocoder_params = S.replicate_pytree(self.vocoder_params, mesh)
        self.mesh = mesh
        return self

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str | Path,
        tokenizer_id: str | None = None,
        vocoder_config: vocoder.VocoderConfig | None = None,
        mimi_config=None,
        dtype=jnp.bfloat16,
        quantize_int8: bool = False,
        int8_activations: bool = False,
        mesh=None,
    ) -> "Qwen3TTS":
        """Load from a local HF checkpoint directory (config.json +
        model.safetensors + speech_tokenizer/model.safetensors).

        ``vocoder_config``/``mimi_config`` default to the production 12 Hz
        speech-tokenizer dimensions; override for non-standard checkpoints
        either via these arguments or via ``vocoder_config.json`` /
        ``mimi_config.json`` sidecar files in ``model_dir`` (written by
        scripts/make_synthetic_ckpt.py; absent from production checkpoints).
        ``dtype`` is the talker/code-predictor compute dtype — bf16 for TPU
        serving (the reference's CUDA/Metal policy), f32 for CPU numerics
        parity (the reference's CPU policy, src/lib.rs:1436).
        ``mesh``: optional ``jax.sharding.Mesh`` — the model is sharded for
        tp/dp serving at load time (see :meth:`shard`).
        """
        model_dir = Path(model_dir)
        if vocoder_config is None:
            vocoder_config = _sidecar_config(
                model_dir / "vocoder_config.json", vocoder.VocoderConfig
            )
        if mimi_config is None:
            from .models.codec.encoder import MimiEncoderConfig

            mimi_config = _sidecar_config(
                model_dir / "mimi_config.json", MimiEncoderConfig
            )
        vocoder_config = vocoder_config or vocoder.VocoderConfig()
        config_path = model_dir / "config.json"
        raw = W.load_safetensors(model_dir / "model.safetensors")

        if config_path.exists():
            config = parse_config_json(config_path)
        else:
            # Weight-shape sniffing fallback (src/lib.rs:371-381)
            hidden = raw["talker.model.norm.weight"].shape[0]
            config = config_for_variant("1.7B" if hidden == 2048 else "0.6B", "base")

        st_path = model_dir / "speech_tokenizer" / "model.safetensors"
        if not st_path.exists():
            alt = model_dir.parent / "speech_tokenizer" / "model.safetensors"
            if not alt.exists():
                raise FileNotFoundError("Speech tokenizer weights not found")
            st_path = alt
        st_raw = W.load_safetensors(st_path)

        tokenizer = TextTokenizer.from_pretrained(tokenizer_id or model_dir)

        talker_params = W.load_talker_params(raw, config.talker, dtype)
        cp_params = W.load_code_predictor_params(raw, config.code_predictor, dtype)
        vocoder_params = vocoder.load_vocoder_params(st_raw, vocoder_config)

        speaker_encoder = None
        if any(k.startswith("speaker_encoder.") for k in raw):
            from .models.speaker import SpeakerEncoder

            speaker_encoder = SpeakerEncoder.from_weights(
                raw, config.speaker_encoder
            )

        speech_encoder = None
        if any(k.startswith("encoder.") for k in st_raw):
            try:
                from .models.codec.encoder import Encoder12Hz, MimiEncoderConfig

                speech_encoder = Encoder12Hz.from_weights(
                    st_raw, mimi_config or MimiEncoderConfig()
                )
            except Exception:  # noqa: BLE001 — ICL optional, mirrors reference
                speech_encoder = None

        model = cls(
            config,
            talker_params,
            cp_params,
            vocoder_params,
            tokenizer,
            speaker_encoder,
            speech_encoder,
            vocoder_config=vocoder_config,
            quantize_int8=quantize_int8,
            int8_activations=int8_activations,
        )
        if mesh is not None:
            model.shard(mesh)
        return model

    @classmethod
    def from_random(
        cls, config: ModelConfig, seed: int = 0, tokenizer: TextTokenizer | None = None
    ) -> "Qwen3TTS":
        """Synthetic weights at real dimensions — benchmarking and tests."""
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        return cls(
            config,
            W.init_talker_params(k1, config.talker),
            W.init_code_predictor_params(k2, config.code_predictor),
            vocoder.init_vocoder_params(k3),
            tokenizer,
        )

    # -- capability probes (mirror src/lib.rs:384-411) --

    @property
    def model_type(self) -> ModelType:
        return self.config.model_type

    def supports_voice_cloning(self) -> bool:
        return self.speaker_encoder is not None

    def supports_preset_speakers(self) -> bool:
        return self.config.model_type == ModelType.CUSTOM_VOICE

    def supports_voice_design(self) -> bool:
        return self.config.model_type == ModelType.VOICE_DESIGN

    def has_speech_encoder(self) -> bool:
        return self.speech_encoder is not None

    # ------------------------------------------------------------------
    # Internal helpers
    # ------------------------------------------------------------------

    def _encode_text(self, text: str) -> list[int]:
        if self.tokenizer is None:
            raise RuntimeError("No tokenizer loaded")
        ids = self.tokenizer.encode(text)
        if not ids:
            raise ValueError("Cannot synthesize empty text (no tokens)")
        return ids

    def _pad_ids(self, ids: list[int]) -> tuple[jnp.ndarray, int]:
        bucket = next_bucket(max(len(ids), 1), TEXT_BUCKET)
        arr = np.zeros(bucket, np.int32)
        arr[: len(ids)] = ids
        return jnp.asarray(arr), len(ids)

    def _uniforms(self, seed: int | None, n: int) -> jnp.ndarray:
        seq = (
            rng.pcg_uniform_sequence(seed, n + 1)
            if seed is not None
            else rng.unseeded_uniform_sequence(n + 1)
        )
        return jnp.asarray(seq)

    def _new_cache(self, prefill_bucket: int, max_new_bucket: int) -> nn.KVCache:
        # Row count rounded to a multiple of 16 (bf16 sublane tile): the
        # streaming talker kernel DMA-slices whole [S, KV*D] cache planes,
        # whose leading dim must be tile-aligned. Bucket growth deltas are
        # multiples of 16 already, so alignment is preserved across _grow.
        rows = prefill_bucket + max_new_bucket + 8
        rows = ((rows + 15) // 16) * 16
        cache = nn.init_kv_cache(
            self.config.talker.layer_stack(),
            batch=1,
            max_seq=rows,
            dtype=self.compute_dtype,
        )
        return self._place_cache(cache)

    def _place_cache(self, cache: nn.KVCache) -> nn.KVCache:
        """Shard a serving cache over the mesh (KV heads on tp), if any."""
        if self.mesh is None:
            return cache
        from jax.sharding import NamedSharding

        from .parallel import sharding as S

        sh = NamedSharding(self.mesh, S.serving_cache_spec())
        return nn.KVCache(jax.device_put(cache.k, sh), jax.device_put(cache.v, sh))

    def _make_session(self, started, options: SynthesisOptions, uniforms) -> "StreamingSession":
        state, trailing, trailing_len, pad = started
        return StreamingSession(
            self,
            state=state,
            scfg=options.sampling_config(),
            options=options,
            trailing=trailing,
            trailing_len=trailing_len,
            pad_embed=pad,
            uniforms=uniforms,
        )

    def _normalize_options(self, options: SynthesisOptions) -> SynthesisOptions:
        """Clamp max_length to the largest frame bucket (2048 frames = 164 s,
        the reference's own ceiling, src/lib.rs:1822). Beyond it the frames
        buffer cannot grow without a recompile, so requests are clamped with
        a warning rather than silently truncated mid-loop."""
        if options.max_length > FRAME_BUCKETS[-1]:
            logger.warning(
                "max_length=%d exceeds the %d-frame ceiling; clamping.",
                options.max_length,
                FRAME_BUCKETS[-1],
            )
            options = replace(options, max_length=FRAME_BUCKETS[-1])
        if options.max_length < 1:
            raise ValueError(f"max_length must be >= 1, got {options.max_length}")
        return options

    def _session_inputs(self, options: SynthesisOptions, prefill_bucket: int):
        """Initial frame capacity, KV cache, and the FULL uniform stream.

        Long generations start with a small cache and grow it at tier
        boundaries between loop re-entries (StreamingSession._advance_managed)
        — dense decode attention then reads only the current tier instead of
        the worst-case bucket every frame. The uniform stream is precomputed
        for the full requested length so segmentation never changes sampling.
        """
        max_new_bucket = next_bucket(options.max_length, buckets=FRAME_BUCKETS)
        initial = min(max_new_bucket, GROWTH_INITIAL_FRAMES)
        cache = self._new_cache(prefill_bucket, initial)
        uniforms = self._uniforms(options.seed, max_new_bucket)
        return initial, cache, uniforms

    def _custom_voice_session(
        self, text: str, speaker: str, language: str, options: SynthesisOptions
    ) -> "StreamingSession":
        options = self._normalize_options(options)
        ids = self._encode_text(text)
        text_ids, text_len = self._pad_ids(ids)
        max_new_bucket, cache, uniforms = self._session_inputs(options, 10)
        started = prefill.prefill_custom_voice(
            self.talker_params,
            self.config.talker,
            options.sampling_config(),
            text_ids,
            jnp.int32(text_len),
            jnp.int32(T.speaker_info(speaker).token_id),
            jnp.int32(T.language_token_id(language)),
            cache,
            uniforms,
            max_new_bucket,
            mesh=self.mesh,
        )
        return self._make_session(started, options, uniforms)

    def _voice_design_session(
        self, text: str, instruct: str, language: str, options: SynthesisOptions
    ) -> "StreamingSession":
        options = self._normalize_options(options)
        ids = self._encode_text(text)
        text_ids, text_len = self._pad_ids(ids)
        # ChatML user framing for the instruct (src/lib.rs:826-828)
        instruct_ids, instruct_len = self._pad_ids(
            self._encode_text(f"<|im_start|>user\n{instruct}<|im_end|>\n")
        )
        max_new_bucket, cache, uniforms = self._session_inputs(
            options, instruct_ids.shape[0] + 9
        )
        started = prefill.prefill_voice_design(
            self.talker_params,
            self.config.talker,
            options.sampling_config(),
            text_ids,
            jnp.int32(text_len),
            instruct_ids,
            jnp.int32(instruct_len),
            jnp.int32(T.language_token_id(language)),
            cache,
            uniforms,
            max_new_bucket,
            mesh=self.mesh,
        )
        return self._make_session(started, options, uniforms)

    def _voice_clone_session(
        self,
        text: str,
        prompt_data: VoiceClonePrompt,
        language: str,
        options: SynthesisOptions,
    ) -> tuple["StreamingSession", int]:
        """Returns (session, ref_frame_count). ICL overrides applied here
        (src/lib.rs:912-929)."""
        options = self._normalize_options(options)
        ids = self._encode_text(text)
        is_icl = prompt_data.ref_codes is not None and prompt_data.ref_text_ids is not None

        if is_icl:
            options = replace(
                options,
                repetition_penalty=max(
                    options.repetition_penalty, ICL_MIN_REPETITION_PENALTY
                ),
                max_length=min(
                    options.max_length,
                    max(ICL_MIN_FRAMES, len(ids) * ICL_FRAMES_PER_TOKEN),
                ),
            )

        compute_dtype = self.compute_dtype
        speaker_vec = jnp.asarray(prompt_data.speaker_embedding, compute_dtype)

        if not is_icl:
            text_ids, text_len = self._pad_ids(ids)
            max_new_bucket, cache, uniforms = self._session_inputs(options, 10)
            started = prefill.prefill_voice_clone_xvector(
                self.talker_params,
                self.config.talker,
                options.sampling_config(),
                text_ids,
                jnp.int32(text_len),
                speaker_vec,
                jnp.int32(T.language_token_id(language)),
                cache,
                uniforms,
                max_new_bucket,
                mesh=self.mesh,
            )
            return self._make_session(started, options, uniforms), 0

        # --- ICL extension: prompt = [voice_clone(9) || icl rows] ---
        ref_codes = np.asarray(prompt_data.ref_codes, np.int32)  # [Tr, 16]
        t_ref = ref_codes.shape[0]
        all_text = list(prompt_data.ref_text_ids) + list(ids) + [T.TTS_EOS]
        tb = next_bucket(len(all_text), TEXT_BUCKET)
        all_text_arr = np.zeros(tb, np.int32)
        all_text_arr[: len(all_text)] = all_text

        codec_rows = self._sum_ref_codec_embeddings(ref_codes)  # [Tr, hidden]
        bos = talker_model.embed_codec(
            self.talker_params, jnp.array([T.CODEC_BOS], jnp.int32)
        )
        cb = next_bucket(t_ref + 1, TEXT_BUCKET)
        codec_padded = jnp.zeros((cb, codec_rows.shape[-1]), codec_rows.dtype)
        codec_padded = codec_padded.at[:1].set(bos)
        codec_padded = codec_padded.at[1 : t_ref + 1].set(codec_rows)
        n_codec = t_ref + 1

        prefill_bucket = 9 + cb + (tb if options.icl_sequential else 0)
        max_new_bucket, cache, uniforms = self._session_inputs(options, prefill_bucket)
        started = prefill.prefill_voice_clone_icl(
            self.talker_params,
            self.config.talker,
            options.sampling_config(),
            jnp.asarray(all_text_arr),
            jnp.int32(len(all_text)),
            speaker_vec,
            codec_padded,
            jnp.int32(n_codec),
            jnp.int32(T.language_token_id(language)),
            cache,
            uniforms,
            max_new_bucket,
            sequential=options.icl_sequential,
            mesh=self.mesh,
        )
        return self._make_session(started, options, uniforms), t_ref

    def _sum_ref_codec_embeddings(self, ref_codes: np.ndarray) -> jnp.ndarray:
        """[T, 16] codes -> [T, hidden]: talker codec embedding of group 0 +
        the 15 CP group embeddings (src/lib.rs:1239-1257)."""
        codes = jnp.asarray(ref_codes, jnp.int32)
        semantic = talker_model.embed_codec(self.talker_params, codes[:, 0])
        tables = self.cp_params["codec_embeddings"]  # [15, V, dim]
        acoustic = jax.vmap(lambda tbl, ids: tbl[ids], in_axes=(0, 1), out_axes=0)(
            tables, codes[:, 1:]
        ).sum(axis=0)
        return semantic + acoustic

    # ------------------------------------------------------------------
    # Public synthesis API
    # ------------------------------------------------------------------

    def synthesize(self, text: str, options: SynthesisOptions | None = None) -> AudioBuffer:
        return self.synthesize_with_voice(text, "ryan", "english", options)

    def _warn_preset_speaker(self, speaker: str) -> None:
        # Variant-mismatch warnings (src/lib.rs:728-741)
        if self.config.model_type == ModelType.BASE:
            logger.warning(
                "Using preset speaker %r on a Base model; Base models are "
                "trained for voice cloning — the output voice will be "
                "unpredictable. Use synthesize_voice_clone() instead.",
                speaker,
            )
        elif self.config.model_type == ModelType.VOICE_DESIGN:
            logger.warning(
                "Using preset speaker %r on a VoiceDesign model; use "
                "synthesize_voice_design() for text-described voices.",
                speaker,
            )

    def synthesize_with_voice(
        self,
        text: str,
        speaker: str = "ryan",
        language: str = "english",
        options: SynthesisOptions | None = None,
    ) -> AudioBuffer:
        """Non-streaming synthesis via the pipelined fused chunk programs
        (StreamingSession.run_to_audio) — no intermediate host syncs, so the
        device chains prefill → generate → decode without idling on round
        trips. Use synthesize_with_timing for the staged per-phase breakdown
        (it syncs at stage boundaries to attribute time)."""
        self._warn_preset_speaker(speaker)
        options = options or SynthesisOptions()
        session = self._custom_voice_session(text, speaker, language, options)
        return session.run_to_audio()

    def synthesize_with_timing(
        self,
        text: str,
        speaker: str = "ryan",
        language: str = "english",
        options: SynthesisOptions | None = None,
    ) -> tuple[AudioBuffer, SynthesisTiming]:
        self._warn_preset_speaker(speaker)
        options = options or SynthesisOptions()
        t0 = time.perf_counter()
        session = self._custom_voice_session(text, speaker, language, options)
        jax.block_until_ready(session.state.token)
        t1 = time.perf_counter()

        frames = session.run_to_completion()
        t2 = time.perf_counter()

        audio = self.decode_codes(frames)
        t3 = time.perf_counter()
        timing = SynthesisTiming(
            prefill_ms=(t1 - t0) * 1e3,
            generation_ms=(t2 - t1) * 1e3,
            generation_frames=len(frames),
            decode_ms=(t3 - t2) * 1e3,
        )
        return audio, timing

    @staticmethod
    def _split_batch_groups(
        voices: list, instructs: list[str | None]
    ) -> list[tuple[str, list[int]]]:
        """Partition batch indices by prompt layout.

        Three layouts exist (models/talker.py): ``basic`` = the 10-row
        custom-voice/x-vector prompt (preset-speaker strings and x-vector
        VoiceClonePrompts coalesce — the speaker row is a vector either way),
        ``icl`` = 9 rows + reference-code rows (VoiceClonePrompts with ref
        codes; separate because the ICL sampling overrides,
        src/lib.rs:915-929, must not leak onto non-ICL streams), and
        ``design`` = instruct rows + 9. Each group runs as one vmapped
        program; order follows first appearance.
        """
        groups: dict[str, list[int]] = {}
        for i, (v, ins) in enumerate(zip(voices, instructs)):
            if ins is not None:
                kind = "design"
            elif isinstance(v, VoiceClonePrompt) and v.ref_codes is not None and v.ref_text_ids is not None:
                kind = "icl"
            else:
                kind = "basic"
            groups.setdefault(kind, []).append(i)
        return list(groups.items())

    def synthesize_batch(
        self,
        texts: list[str],
        speakers: list | str = "ryan",
        languages: list[str] | str = "english",
        options: SynthesisOptions | None = None,
        seeds: list[int] | None = None,
        instructs: list[str | None] | None = None,
    ) -> list[AudioBuffer]:
        """Throughput mode: synthesize B utterances through ONE vmapped loop.

        The frame loop is bandwidth-bound, so batching amortizes the weight
        streaming across streams — near-B x aggregate throughput on one chip
        (new capability; the reference is strictly batch-1). Stream i uses
        ``seeds[i]`` (default options.seed + i), reproducing its
        single-stream output exactly — EXCEPT when ``int8_activations=True``
        (w8a8): solo decode deliberately stays weight-only int8, so batched
        output differs from the solo output by the activation rounding
        (ADVICE r4; see server --w8a8 help).

        ``speakers`` entries may be preset-speaker names or
        ``VoiceClonePrompt`` objects (x-vector or ICL cloning);
        ``instructs[i]`` switches stream i to voice-design. Streams are
        grouped by prompt layout (see ``_split_batch_groups``); each group
        runs one vmapped loop, and ALL streams share one batched vocoder
        pass. A homogeneous batch (the common serving case) is exactly one
        loop, as before.
        """
        options = self._normalize_options(options or SynthesisOptions())
        b = len(texts)
        if isinstance(speakers, (str, VoiceClonePrompt)):
            speakers = [speakers] * b
        if isinstance(languages, str):
            languages = [languages] * b
        if instructs is None:
            instructs = [None] * b
        base_seed = options.seed if options.seed is not None else 0
        if seeds is None:
            seeds = [base_seed + i for i in range(b)]

        frames_all: list[np.ndarray | None] = [None] * b
        counts_all = np.zeros(b, np.int64)
        refs_all: list[np.ndarray | None] = [None] * b
        for kind, idx in self._split_batch_groups(speakers, instructs):
            frames_g, counts_g, refs_g = self._generate_batch_group(
                kind,
                [texts[i] for i in idx],
                [speakers[i] for i in idx],
                [languages[i] for i in idx],
                [instructs[i] for i in idx],
                options,
                [seeds[i] for i in idx],
            )
            for j, i in enumerate(idx):
                frames_all[i] = frames_g[j]
                counts_all[i] = counts_g[j]
                refs_all[i] = refs_g[j]

        # One batched vocoder pass across ALL groups at the max combined
        # frame count; ICL streams prepend their reference codes and cut the
        # prefix samples (exactly ref_len * 1920 — the reference's
        # proportional cut, src/lib.rs:1022-1044). Per-stream right-pad trim
        # is exact because the vocoder is causal and padded frames are zeros.
        ref_lens = np.array(
            [0 if r is None else len(r) for r in refs_all], np.int64
        )
        totals = ref_lens + counts_all
        t_max = int(totals.max()) if b else 0
        if t_max == 0:
            return [AudioBuffer(np.zeros(0, np.float32), T.OUTPUT_SAMPLE_RATE)] * b
        codes = np.zeros((b, t_max, 16), np.int32)
        for i in range(b):
            if ref_lens[i]:
                codes[i, : ref_lens[i]] = refs_all[i]
            if counts_all[i]:
                codes[i, ref_lens[i] : totals[i]] = frames_all[i][: counts_all[i]]
        wav = vocoder.decode_bucketed(
            self.vocoder_params,
            self.vocoder_config,
            np.swapaxes(codes, 1, 2),
            bucket=DECODE_BUCKET,
        )
        spf = T.SAMPLES_PER_FRAME
        return [
            AudioBuffer(
                wav[i, int(ref_lens[i]) * spf : int(totals[i]) * spf],
                T.OUTPUT_SAMPLE_RATE,
            )
            for i in range(b)
        ]

    def _generate_batch_group(
        self,
        kind: str,
        texts: list[str],
        voices: list,
        languages: list[str],
        instructs: list[str | None],
        options: SynthesisOptions,
        seeds: list[int],
    ) -> tuple[list[np.ndarray], np.ndarray, list[np.ndarray | None]]:
        """Prefill + run the vmapped frame loop for one layout group.

        Returns (per-stream frames [T,16], counts, per-stream ref codes for
        the vocoder prefix — None except in ICL mode).
        """
        from .generation import batch as gbatch

        (states, trailing, trailing_lens, pad_embed, uniforms, scfg,
         frame_limits, refs) = self._prepare_batch_group(
            kind, texts, voices, languages, instructs, options, seeds
        )
        states = gbatch.generate_frames_batch(
            self.talker_params,
            self.cp_params,
            self.config.talker,
            self.config.code_predictor,
            scfg,
            states,
            trailing,
            trailing_lens,
            pad_embed,
            uniforms,
            frame_limits,
            mesh=self.mesh,
            w8a8=self.w8a8,
        )
        frames, counts = jax.device_get((states.frames, states.frame_idx))
        frames = np.asarray(frames, np.int32)
        counts = np.asarray(counts)
        return [frames[j] for j in range(len(texts))], counts, refs

    def _shard_batch_arrays(self, b: int, caches, arrays: dict) -> tuple:
        """dp x tp batched serving: device_put per-stream arrays over dp, KV
        heads over tp. Requires b % dp == 0 (GSPMD even-shard constraint);
        falls back to unsharded placement otherwise."""
        if self.mesh is None:
            return caches, arrays
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel import sharding as S

        dp = self.mesh.shape.get("dp", 1)
        if b % dp != 0:
            logger.warning(
                "synthesize_batch: batch %d not divisible by dp=%d; "
                "running without dp sharding.", b, dp,
            )
            return caches, arrays
        batch_sh = lambda spec: NamedSharding(self.mesh, spec)
        caches = nn.KVCache(
            jax.device_put(caches.k, batch_sh(S.batch_cache_spec())),
            jax.device_put(caches.v, batch_sh(S.batch_cache_spec())),
        )
        arrays = {
            k: jax.device_put(v, batch_sh(P("dp", *([None] * (v.ndim - 1)))))
            for k, v in arrays.items()
        }
        return caches, arrays

    def _prepare_batch_group(
        self,
        kind: str,
        texts: list[str],
        voices: list,
        languages: list[str],
        instructs: list[str | None],
        options: SynthesisOptions,
        seeds: list[int],
    ):
        """Encode + prefill one layout group of a batch (one vmapped program);
        shared by ``synthesize_batch`` and ``synthesize_streaming_batch``.

        Returns (batched GenState, trailing [B,Tb,H], trailing_lens [B],
        pad_embed [H], uniforms [B,max+1], scfg, frame_limits [B] int32,
        per-stream ref codes list). ``kind`` selects the prompt layout
        (see ``_split_batch_groups``); an all-preset ``basic`` group keeps
        the original custom-voice program, a group with any x-vector entry
        runs the clone program with per-stream speaker vectors
        (bit-identical rows for preset entries — the speaker-token
        embedding IS the vector).
        """
        from .generation import batch as gbatch

        b = len(texts)
        encoded = [self._encode_text(t) for t in texts]
        refs: list[np.ndarray | None] = [None] * b

        # Per-stream frame budgets: ICL streams cap generation at
        # 6 frames/text-token (min 75), the reference's anti-babble guard
        # (src/lib.rs:915-929); other layouts share options.max_length.
        if kind == "icl":
            per_max = [
                min(
                    options.max_length,
                    max(ICL_MIN_FRAMES, len(e) * ICL_FRAMES_PER_TOKEN),
                )
                for e in encoded
            ]
            scfg = replace(
                options,
                repetition_penalty=max(
                    options.repetition_penalty, ICL_MIN_REPETITION_PENALTY
                ),
            ).sampling_config()
        else:
            per_max = [options.max_length] * b
            scfg = options.sampling_config()

        max_new_bucket = next_bucket(max(per_max), buckets=FRAME_BUCKETS)
        uniforms = jnp.asarray(
            np.stack(
                [rng.pcg_uniform_sequence(s, max_new_bucket + 1) for s in seeds]
            )
        )
        frame_limits = jnp.asarray(per_max, jnp.int32)
        lang_ids = jnp.asarray([T.language_token_id(l) for l in languages], jnp.int32)

        def new_caches(prefill_rows: int) -> nn.KVCache:
            stack_cfg = self.config.talker.layer_stack()
            dtype = self.compute_dtype
            shape = (
                b,
                stack_cfg.num_layers,
                1,
                prefill_rows + max_new_bucket + 8,
                stack_cfg.num_kv_heads,
                stack_cfg.head_dim,
            )
            return nn.KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

        def speaker_vec(v) -> jnp.ndarray:
            if isinstance(v, VoiceClonePrompt):
                return jnp.asarray(v.speaker_embedding, self.compute_dtype)
            return talker_model.embed_codec(
                self.talker_params, jnp.int32(T.speaker_info(v).token_id)
            )

        if kind == "icl":
            # Per-stream ICL rows at shared buckets; true lengths traced.
            all_texts = [
                list(v.ref_text_ids) + list(e) + [T.TTS_EOS]
                for v, e in zip(voices, encoded)
            ]
            tb = next_bucket(max(len(a) for a in all_texts), TEXT_BUCKET)
            all_text_ids = np.zeros((b, tb), np.int32)
            for i, a in enumerate(all_texts):
                all_text_ids[i, : len(a)] = a
            n_texts = jnp.asarray([len(a) for a in all_texts], jnp.int32)

            ref_arrays = [np.asarray(v.ref_codes, np.int32) for v in voices]
            refs = list(ref_arrays)
            cb = next_bucket(max(r.shape[0] for r in ref_arrays) + 1, TEXT_BUCKET)
            hidden = self.config.talker.hidden_size
            bos = talker_model.embed_codec(
                self.talker_params, jnp.array([T.CODEC_BOS], jnp.int32)
            )
            codec_rows = jnp.zeros((b, cb, hidden), bos.dtype)
            for i, r in enumerate(ref_arrays):
                rows_i = self._sum_ref_codec_embeddings(r)
                codec_rows = codec_rows.at[i, :1].set(bos)
                codec_rows = codec_rows.at[i, 1 : r.shape[0] + 1].set(rows_i)
            n_codecs = jnp.asarray([r.shape[0] + 1 for r in ref_arrays], jnp.int32)

            prefill_rows = 9 + cb + (tb if options.icl_sequential else 0)
            caches, arrs = self._shard_batch_arrays(
                b,
                new_caches(prefill_rows),
                {
                    "all_text_ids": jnp.asarray(all_text_ids),
                    "n_texts": n_texts,
                    "speaker_vecs": jnp.stack([speaker_vec(v) for v in voices]),
                    "codec_rows": codec_rows,
                    "n_codecs": n_codecs,
                    "lang_ids": lang_ids,
                    "uniforms": uniforms,
                },
            )
            states, trailing, trailing_lens, pads = gbatch.prefill_voice_clone_icl_batch(
                self.talker_params,
                self.config.talker,
                scfg,
                arrs["all_text_ids"],
                arrs["n_texts"],
                arrs["speaker_vecs"],
                arrs["codec_rows"],
                arrs["n_codecs"],
                arrs["lang_ids"],
                caches,
                arrs["uniforms"],
                max_new_bucket,
                sequential=options.icl_sequential,
                mesh=self.mesh,
                w8a8=self.w8a8,
            )
            return (states, trailing, trailing_lens, pads[0],
                    arrs["uniforms"], scfg, frame_limits, refs)

        tb = next_bucket(max(max(len(e) for e in encoded), 1), TEXT_BUCKET)
        text_ids = np.zeros((b, tb), np.int32)
        for i, e in enumerate(encoded):
            text_ids[i, : len(e)] = e
        text_lens = jnp.asarray([len(e) for e in encoded], jnp.int32)

        if kind == "design":
            chats = [
                self._encode_text(f"<|im_start|>user\n{ins}<|im_end|>\n")
                for ins in instructs
            ]
            ib = next_bucket(max(max(len(c) for c in chats), 1), TEXT_BUCKET)
            instruct_ids = np.zeros((b, ib), np.int32)
            for i, c in enumerate(chats):
                instruct_ids[i, : len(c)] = c
            instruct_lens = jnp.asarray([len(c) for c in chats], jnp.int32)
            caches, arrs = self._shard_batch_arrays(
                b,
                new_caches(ib + 9),
                {
                    "text_ids": jnp.asarray(text_ids),
                    "text_lens": text_lens,
                    "instruct_ids": jnp.asarray(instruct_ids),
                    "instruct_lens": instruct_lens,
                    "lang_ids": lang_ids,
                    "uniforms": uniforms,
                },
            )
            states, trailing, trailing_lens, pads = gbatch.prefill_voice_design_batch(
                self.talker_params,
                self.config.talker,
                scfg,
                arrs["text_ids"],
                arrs["text_lens"],
                arrs["instruct_ids"],
                arrs["instruct_lens"],
                arrs["lang_ids"],
                caches,
                arrs["uniforms"],
                max_new_bucket,
                mesh=self.mesh,
                w8a8=self.w8a8,
            )
            return (states, trailing, trailing_lens, pads[0],
                    arrs["uniforms"], scfg, frame_limits, refs)

        if any(isinstance(v, VoiceClonePrompt) for v in voices):
            caches, arrs = self._shard_batch_arrays(
                b,
                new_caches(10),
                {
                    "text_ids": jnp.asarray(text_ids),
                    "text_lens": text_lens,
                    "speaker_vecs": jnp.stack([speaker_vec(v) for v in voices]),
                    "lang_ids": lang_ids,
                    "uniforms": uniforms,
                },
            )
            states, trailing, trailing_lens, pads = gbatch.prefill_voice_clone_batch(
                self.talker_params,
                self.config.talker,
                scfg,
                arrs["text_ids"],
                arrs["text_lens"],
                arrs["speaker_vecs"],
                arrs["lang_ids"],
                caches,
                arrs["uniforms"],
                max_new_bucket,
                mesh=self.mesh,
                w8a8=self.w8a8,
            )
            return (states, trailing, trailing_lens, pads[0],
                    arrs["uniforms"], scfg, frame_limits, refs)

        speaker_ids = jnp.asarray(
            [T.speaker_info(s).token_id for s in voices], jnp.int32
        )
        caches, arrs = self._shard_batch_arrays(
            b,
            new_caches(10),
            {
                "text_ids": jnp.asarray(text_ids),
                "text_lens": text_lens,
                "speaker_ids": speaker_ids,
                "lang_ids": lang_ids,
                "uniforms": uniforms,
            },
        )
        states, trailing, trailing_lens, pads = gbatch.prefill_custom_voice_batch(
            self.talker_params,
            self.config.talker,
            scfg,
            arrs["text_ids"],
            arrs["text_lens"],
            arrs["speaker_ids"],
            arrs["lang_ids"],
            caches,
            arrs["uniforms"],
            max_new_bucket,
            mesh=self.mesh,
            w8a8=self.w8a8,
        )
        return (states, trailing, trailing_lens, pads[0],
                arrs["uniforms"], scfg, frame_limits, refs)

    def synthesize_streaming_batch(
        self,
        texts: list[str],
        speakers: list | str = "ryan",
        languages: list[str] | str = "english",
        options: SynthesisOptions | None = None,
        seeds: list[int] | None = None,
        instructs: list[str | None] | None = None,
    ) -> "StreamingBatchSession":
        """Batched streaming: B concurrent streams, ONE fused program per chunk.

        Each ``next_chunks()`` call advances ALL live streams by one chunk
        through a single vmapped while_loop and decodes their new frames with
        the batch-native sample-exact streaming vocoder — the per-frame weight
        streaming (the bandwidth bound) is paid once for the whole batch, so
        aggregate streaming throughput scales near-B x on one chip while every
        stream still receives audio at chunk cadence. Per-stream output is
        identical to ``synthesize_batch`` (and hence to the single-stream
        path; stream i uses seeds[i], default options.seed + i). New
        capability: the reference serves strictly one stream at a time
        (src/lib.rs:1484-1782, kv_cache.rs:262).

        ``speakers`` entries may be ``VoiceClonePrompt`` objects and
        ``instructs[i]`` switches stream i to voice-design, exactly as in
        ``synthesize_batch`` — but one session runs ONE prompt layout: all
        streams must group together (preset + x-vector clones coalesce; ICL
        clones and designs each need their own session — the server groups
        by layout signature). ICL streams feed their reference codes through
        the shared streaming vocoder ahead of their generated frames, so
        early chunks for long-reference streams carry no audible samples yet
        (the clone TTFA inherently includes the reference-prefix decode).
        """
        options = self._normalize_options(options or SynthesisOptions())
        b = len(texts)
        if isinstance(speakers, (str, VoiceClonePrompt)):
            speakers = [speakers] * b
        if isinstance(languages, str):
            languages = [languages] * b
        if instructs is None:
            instructs = [None] * b
        base_seed = options.seed if options.seed is not None else 0
        if seeds is None:
            seeds = [base_seed + i for i in range(b)]
        groups = self._split_batch_groups(speakers, instructs)
        if len(groups) > 1:
            raise ValueError(
                "synthesize_streaming_batch runs one prompt layout per "
                f"session; got {[k for k, _ in groups]}. Split the request "
                "by layout (preset speakers and x-vector clones may mix)."
            )
        kind = groups[0][0]
        (states, trailing, trailing_lens, pad_embed, uniforms, scfg,
         frame_limits, refs) = self._prepare_batch_group(
            kind, texts, speakers, languages, instructs, options, seeds
        )
        return StreamingBatchSession(
            self, states, scfg, options, trailing, trailing_lens, pad_embed,
            uniforms, frame_limits=frame_limits, refs=refs,
        )

    def synthesize_voice_design(
        self,
        text: str,
        instruct: str,
        language: str = "english",
        options: SynthesisOptions | None = None,
    ) -> AudioBuffer:
        if self.config.model_type != ModelType.VOICE_DESIGN:
            logger.warning(
                "VoiceDesign synthesis on a %s model — output may be "
                "unpredictable (src/lib.rs:812-820).",
                self.config.label,
            )
        options = options or SynthesisOptions()
        session = self._voice_design_session(text, instruct, language, options)
        return session.run_to_audio()

    def synthesize_voice_design_streaming(
        self,
        text: str,
        instruct: str,
        language: str = "english",
        options: SynthesisOptions | None = None,
    ) -> "StreamingSession":
        options = options or SynthesisOptions()
        return self._voice_design_session(text, instruct, language, options)

    def synthesize_streaming(
        self,
        text: str,
        speaker: str = "ryan",
        language: str = "english",
        options: SynthesisOptions | None = None,
    ) -> "StreamingSession":
        options = options or SynthesisOptions()
        return self._custom_voice_session(text, speaker, language, options)

    def create_voice_clone_prompt(
        self,
        ref_audio: AudioBuffer,
        ref_text: str | None = None,
        pad_to_seconds: float | None = None,
    ) -> VoiceClonePrompt:
        """Build x-vector (+ optional ICL) conditioning from reference audio.

        The speaker encoder buckets mel-frame lengths internally with masked
        reflection/pooling, so a handful of cached XLA programs serve every
        audio length with EXACTLY the unpadded x-vector (models/speaker.py).

        ``pad_to_seconds``: legacy knob that zero-pads the reference audio
        itself before encoding. No longer needed for compile caching and it
        mildly dilutes the pooled x-vector (padded audio changes the mel);
        kept for compatibility — prefer the default None.
        """
        if self.speaker_encoder is None:
            hint = {
                ModelType.CUSTOM_VOICE: " CustomVoice models use preset speakers; use a Base model for cloning.",
                ModelType.VOICE_DESIGN: " VoiceDesign models use text-described voices; use a Base model for cloning.",
            }.get(self.config.model_type, " Only Base checkpoints include a speaker encoder.")
            raise RuntimeError("Speaker encoder not available." + hint)

        if ref_audio.sample_rate != T.OUTPUT_SAMPLE_RATE:
            ref_audio = resample_to_24k(ref_audio)

        samples = ref_audio.samples
        if pad_to_seconds:
            unit = int(pad_to_seconds * T.OUTPUT_SAMPLE_RATE)
            target = max(((len(samples) + unit - 1) // unit) * unit, unit)
            padded = np.zeros(target, np.float32)
            padded[: len(samples)] = samples
            samples = padded
            ref_audio = AudioBuffer(samples, T.OUTPUT_SAMPLE_RATE)

        speaker_embedding = self.speaker_encoder.encode(samples)

        ref_codes = None
        ref_text_ids = None
        if ref_text is not None:
            if self.speech_encoder is None:
                raise RuntimeError(
                    "ICL voice cloning requires the speech encoder; pass "
                    "ref_text=None for x-vector-only cloning."
                )
            ref_codes = self.speech_encoder.encode(ref_audio.samples)
            ref_text_ids = self._encode_text(ref_text)

        return VoiceClonePrompt(np.asarray(speaker_embedding), ref_codes, ref_text_ids)

    def synthesize_voice_clone(
        self,
        text: str,
        prompt: VoiceClonePrompt,
        language: str = "english",
        options: SynthesisOptions | None = None,
    ) -> AudioBuffer:
        """Non-streaming cloning via the pipelined chunk programs. In ICL
        mode the reference codes advance the vocoder state as un-emitted
        context, which equals the batch path's prepend-and-proportional-cut
        exactly: the cut is ref_len * total_samples / total_frames =
        ref_len * 1920 samples, i.e. precisely the prefix's samples
        (src/lib.rs:1022-1044). Use synthesize_voice_clone_debug for the
        staged path that also returns the raw frames."""
        options = options or SynthesisOptions()
        session, ref_len = self._voice_clone_session(text, prompt, language, options)
        if ref_len > 0 and prompt.ref_codes is not None:
            session.prefix_codes = np.asarray(prompt.ref_codes, np.int32)
        return session.run_to_audio()

    def synthesize_voice_clone_streaming(
        self,
        text: str,
        prompt: VoiceClonePrompt,
        language: str = "english",
        options: SynthesisOptions | None = None,
    ) -> "StreamingSession":
        """Streaming voice cloning: chunked audio from an x-vector/ICL prompt.

        Public streaming parity with the reference's generic post-prefill
        session (StreamingSession::from_prefill, src/lib.rs:1584-1645), which
        it never exposes for cloning — here it is first-class. In ICL mode
        the reference codes are decoded as vocoder context ahead of the first
        chunk and cut from the output, the streaming equivalent of the batch
        path's prepend-and-proportional-cut (src/lib.rs:1022-1044).
        """
        options = options or SynthesisOptions()
        session, ref_len = self._voice_clone_session(text, prompt, language, options)
        if ref_len > 0 and prompt.ref_codes is not None:
            session.prefix_codes = np.asarray(prompt.ref_codes, np.int32)
        return session

    def synthesize_voice_clone_debug(
        self,
        text: str,
        prompt: VoiceClonePrompt,
        language: str = "english",
        options: SynthesisOptions | None = None,
    ) -> tuple[AudioBuffer, np.ndarray]:
        options = options or SynthesisOptions()
        session, ref_len = self._voice_clone_session(text, prompt, language, options)
        frames = session.run_to_completion()

        if ref_len > 0 and prompt.ref_codes is not None:
            combined = np.concatenate(
                [np.asarray(prompt.ref_codes, np.int32), frames], axis=0
            )
            audio = self.decode_codes(combined)
            # Proportional front cut (src/lib.rs:1022-1044)
            cut = ref_len * len(audio) // max(len(combined), 1)
            audio = AudioBuffer(audio.samples[min(cut, len(audio)):], audio.sample_rate)
        else:
            audio = self.decode_codes(frames)
        return audio, frames

    # ------------------------------------------------------------------
    # Decode helpers
    # ------------------------------------------------------------------

    def codes_to_tensor(self, frames: np.ndarray) -> np.ndarray:
        """[T, 16] frame-major codes -> [1, 16, T] codebook-major."""
        frames = np.asarray(frames, np.int32)
        return frames.T[None]

    def decode_codes(self, frames: np.ndarray) -> AudioBuffer:
        """Decode [T, 16] frames to 24 kHz audio (bucketed, exact)."""
        frames = np.asarray(frames, np.int32)
        if frames.size == 0:
            return AudioBuffer(np.zeros(0, np.float32), T.OUTPUT_SAMPLE_RATE)
        wav = vocoder.decode_bucketed(
            self.vocoder_params,
            self.vocoder_config,
            self.codes_to_tensor(frames),
            bucket=DECODE_BUCKET,
        )
        return AudioBuffer(wav[0], T.OUTPUT_SAMPLE_RATE)


@partial(
    jax.jit,
    static_argnames=("tcfg", "cpcfg", "scfg", "vcfg", "chunk", "mesh"),
    donate_argnames=("state",),
)
def _advance_and_decode_chunk(
    talker_params,
    cp_params,
    voc_params,
    tcfg,
    cpcfg,
    scfg,
    vcfg,
    state,
    trailing,
    trailing_len,
    pad_embed,
    uniforms,
    frame_limit,
    emitted,
    chunk: int,
    mesh=None,
):
    """One streaming chunk as a SINGLE device program.

    Advancing the while_loop, slicing the chunk's frame rows on-device, and
    vocoder-decoding them in one jit means one dispatch + one host fetch per
    chunk instead of two round trips (measured ~30 ms/sync through the
    remote-TPU tunnel; the decode itself is ~4 ms of device time at chunk
    10). Rows past ``frame_idx`` are zeros and the vocoder is causal, so
    the host-side trim to the true frame count is exact — identical to
    decoding the unpadded rows with a chunk-sized bucket.
    """
    state = core.generate_frames(
        talker_params, cp_params, tcfg, cpcfg, scfg, state,
        trailing, trailing_len, pad_embed, uniforms, frame_limit, mesh,
    )
    rows = jax.lax.dynamic_slice(
        state.frames, (emitted, 0), (chunk, state.frames.shape[1])
    )  # [chunk, 16]
    wav = vocoder.decode(voc_params, vcfg, rows.T[None])  # [1, chunk*1920]
    return state, wav, state.frame_idx, state.done


@partial(
    jax.jit,
    static_argnames=("tcfg", "cpcfg", "scfg", "vcfg", "chunk", "mesh"),
    donate_argnames=("state", "vstate"),
)
def _advance_and_decode_chunk_exact(
    talker_params,
    cp_params,
    voc_params,
    tcfg,
    cpcfg,
    scfg,
    vcfg,
    state,
    vstate,
    trailing,
    trailing_len,
    pad_embed,
    uniforms,
    frame_limit,
    emitted,
    chunk: int,
    mesh=None,
):
    """Streaming chunk with SAMPLE-EXACT decode, one device program.

    Like ``_advance_and_decode_chunk`` but the vocoder carries causal state
    (``vocoder.VocoderStreamState``) across chunks, so the concatenated
    stream equals the one-shot batch decode (up to matmul-tiling ulps; see
    models/codec/vocoder.py). The frames buffer is padded by ``chunk`` rows
    in-program so the chunk slice never clamps at the final partial chunk.
    """
    state = core.generate_frames(
        talker_params, cp_params, tcfg, cpcfg, scfg, state,
        trailing, trailing_len, pad_embed, uniforms, frame_limit, mesh,
    )
    frames_ext = jnp.concatenate(
        [state.frames, jnp.zeros((chunk, state.frames.shape[1]), state.frames.dtype)]
    )
    rows = jax.lax.dynamic_slice(
        frames_ext, (emitted, 0), (chunk, frames_ext.shape[1])
    )  # [chunk, 16]
    wav, vstate = vocoder.decode_stream_chunk(voc_params, vcfg, vstate, rows.T[None])
    return state, vstate, wav, state.frame_idx, state.done


@partial(
    jax.jit,
    static_argnames=("tcfg", "cpcfg", "scfg", "vcfg", "chunk", "mesh", "w8a8"),
    donate_argnames=("states", "vstate"),
)
def _advance_and_decode_chunk_batch(
    talker_params,
    cp_params,
    voc_params,
    tcfg,
    cpcfg,
    scfg,
    vcfg,
    states,
    vstate,
    trailing,
    trailing_lens,
    pad_embed,
    uniforms,
    frame_limit,
    emitted,
    chunk: int,
    ref_codes=None,
    ref_lens=None,
    mesh=None,
    w8a8: bool = False,
):
    """One streaming chunk for a BATCH of streams, as a single device program.

    The vmapped while_loop advances every live stream by ``chunk`` frames
    (EOS-done streams freeze; see generation/batch.py), then the batch-native
    streaming vocoder decodes the new rows of all streams together — the
    frame loop's weight streaming and the vocoder's weight reads are paid
    once per chunk for the whole batch. Rows past a stream's own frame count
    are zero-code frames; the stack is causal, so the per-stream host-side
    trim is exact and each stream's concatenated audio equals its
    ``synthesize_batch`` output.

    ICL cloning: ``ref_codes [B, Cmax, 16]`` / ``ref_lens [B]`` put each
    stream on its own combined timeline — vocoder grid row t of stream i is
    ``ref_codes[i, t]`` for t < ref_lens[i] and generated frame
    ``t - ref_lens[i]`` after — so the shared-position batched vocoder state
    stays exact per stream (its column is exactly its solo
    [ref || generated] sequence; the host trims the reference-prefix
    samples, the streaming equivalent of the batch path's
    prepend-and-proportional-cut, src/lib.rs:1022-1044).
    """
    from .generation import batch as gbatch

    # Same vmap constraints as generate_frames_batch: tiered decode attention
    # off (batched lax.switch computes all branches) and no batch-1 whole-step
    # stream kernels.
    from .ops import quant as _Q

    tcfg = replace(tcfg, decode_tiering=False)
    talker_params = {
        k: v for k, v in talker_params.items()
        if k not in ("stream_pack", "tp_pack")
    }
    cp_params = {
        k: v for k, v in cp_params.items()
        if k not in ("stream_pack", "tp_pack")
    }
    # Batched programs default to the XLA dequant dot (measured equal to the
    # row-folded Pallas kernel, and the only GSPMD-partitionable path —
    # generation/batch.py:_batch_pallas_dequant, journal R4.8).
    with _Q.pallas_dequant_scope(gbatch._batch_pallas_dequant(mesh)), _Q.w8a8_scope(w8a8):
        states = gbatch._batched_generate(
            talker_params, cp_params, tcfg, cpcfg, scfg, states,
            trailing, trailing_lens, pad_embed, uniforms, frame_limit,
        )
    b, _, n_codes = states.frames.shape
    frames_ext = jnp.concatenate(
        [states.frames, jnp.zeros((b, chunk, n_codes), states.frames.dtype)], axis=1
    )
    if ref_codes is None:
        rows = jax.lax.dynamic_slice(
            frames_ext, (0, emitted, 0), (b, chunk, n_codes)
        )  # [B, chunk, 16]
    else:
        # Grid gather: per-stream reference prefix then generated frames.
        t_idx = emitted + jnp.arange(chunk, dtype=jnp.int32)  # [chunk]
        gen_idx = jnp.clip(
            t_idx[None, :] - ref_lens[:, None], 0, frames_ext.shape[1] - 1
        )  # [B, chunk]
        gen_rows = jnp.take_along_axis(frames_ext, gen_idx[..., None], axis=1)
        ref_idx = jnp.clip(t_idx, 0, ref_codes.shape[1] - 1)
        ref_rows = ref_codes[:, ref_idx]  # [B, chunk, 16]
        in_ref = (t_idx[None, :] < ref_lens[:, None])[..., None]
        rows = jnp.where(in_ref, ref_rows, gen_rows)
    wav, vstate = vocoder.decode_stream_chunk(
        voc_params, vcfg, vstate, jnp.swapaxes(rows, 1, 2)
    )
    return states, vstate, wav, states.frame_idx, states.done


class StreamingSession:
    """Pull-based streaming synthesis; also drives non-streaming synthesis.

    Holds the donated generation carry between chunks; each ``next_chunk``
    advances the jitted while_loop by ``chunk_frames`` frames and decodes
    only the new frames (chunked vocoder context, like the reference's
    StreamingSession, src/lib.rs:1484-1782).
    """

    def __init__(self, model, state, scfg, options, trailing, trailing_len, pad_embed, uniforms):
        self.model = model
        self.state = state
        self.scfg = scfg
        self.options = options
        self.trailing = trailing
        self.trailing_len = trailing_len
        self.pad_embed = pad_embed
        self.uniforms = uniforms
        self.frames_emitted = 0
        self._exhausted = False
        # ICL voice cloning: reference codes decoded as vocoder context ahead
        # of the FIRST chunk, then cut from the output (the streaming
        # equivalent of the batch path's prepend-and-cut, src/lib.rs:1022-1044).
        self.prefix_codes: np.ndarray | None = None
        # Sample-exact streaming vocoder carry (options.streaming_exact).
        self.vstate: vocoder.VocoderStreamState | None = None
        # Speculative in-flight chunk programs (options.streaming_lookahead):
        # list of (start_frame, chunk_size, wav_dev, n_dev, done_dev).
        self._pending: list[tuple[int, int, object, object, object]] = []
        # Dispatch frontier in frames (>= frames_emitted while speculating).
        self._spec_frontier = 0

    @property
    def frames_generated(self) -> int:
        return int(self.state.frame_idx)

    def is_done(self) -> bool:
        return self._exhausted

    def _advance(self, frame_limit: int):
        self.state = core.generate_frames_jit(
            self.model.talker_params,
            self.model.cp_params,
            self.model.config.talker,
            self.model.config.code_predictor,
            self.scfg,
            self.state,
            self.trailing,
            self.trailing_len,
            self.pad_embed,
            self.uniforms,
            jnp.int32(frame_limit),
            mesh=self.model.mesh,
        )

    def _grow(self, new_cap: int) -> None:
        """Extend the donated frames/cache buffers to ``new_cap`` frames."""
        s = self.state
        delta = new_cap - s.frames.shape[0]
        frames = jnp.concatenate(
            [s.frames, jnp.zeros((delta, s.frames.shape[1]), s.frames.dtype)]
        )
        pad = ((0, 0), (0, 0), (0, delta), (0, 0), (0, 0))
        cache = nn.KVCache(jnp.pad(s.cache.k, pad), jnp.pad(s.cache.v, pad))
        cache = self.model._place_cache(cache)
        self.state = s._replace(cache=cache, frames=frames)
        if self.vstate is not None:
            # Keep the streaming vocoder KV capacity in step with the frame
            # buffer (rows past pos are zeros and masked — exactness holds).
            kv_pad = ((0, 0), (0, 0), (0, delta), (0, 0), (0, 0))
            self.vstate = self.vstate._replace(
                kv_k=jnp.pad(self.vstate.kv_k, kv_pad),
                kv_v=jnp.pad(self.vstate.kv_v, kv_pad),
            )

    def _ensure_vstate(self, prefix_frames: int = 0) -> None:
        if self.vstate is None:
            max_t = self.state.frames.shape[0]
            if prefix_frames:
                max_t += next_bucket(prefix_frames, DECODE_BUCKET)
            self.vstate = vocoder.init_stream_state(
                self.model.vocoder_config, max_frames=max_t
            )

    def _feed_prefix(self, prefix: np.ndarray, chunk: int) -> None:
        """Advance the vocoder stream state through ICL reference codes
        without emitting audio — the sample-exact streaming equivalent of the
        batch path's prepend-and-proportional-cut (src/lib.rs:1022-1044).

        Pieces are chunk-sized plus a binary decomposition of the remainder,
        so only O(log chunk) distinct program shapes ever compile.
        """
        n = len(prefix)
        sizes = [chunk] * (n // chunk)
        r, bit = n % chunk, 1
        while bit <= r:
            if r & bit:
                sizes.append(bit)
            bit <<= 1
        i = 0
        for s in sizes:
            rows = np.ascontiguousarray(prefix[i : i + s])
            _, self.vstate = vocoder.decode_stream_chunk_jit(
                self.model.vocoder_params,
                self.model.vocoder_config,
                self.vstate,
                jnp.asarray(rows.T[None]),
            )
            i += s

    def _advance_managed(self, target: int) -> tuple[int, bool]:
        """Advance to ``target`` total frames, growing buffers per tier.

        Uniforms are precomputed for the full run and the loop body is
        position-indexed, so segmentation is token-exact vs a full-size
        buffer (tested). One counter read per segment (<= 4 per utterance;
        the reference syncs once per FRAME, src/lib.rs:649).
        Returns host ints (frames_generated, done).
        """
        target = min(target, self.options.max_length)
        while True:
            self._advance(target)
            n, done = jax.device_get((self.state.frame_idx, self.state.done))
            n, done = int(n), bool(done)
            cap = self.state.frames.shape[0]
            if done or n >= target or n < cap:
                return n, done
            new_cap = min(
                next_bucket(cap + 1, buckets=FRAME_BUCKETS),
                next_bucket(self.options.max_length, buckets=FRAME_BUCKETS),
            )
            if new_cap <= cap:
                return n, done
            self._grow(new_cap)

    def run_to_completion(self) -> np.ndarray:
        """Generate every remaining frame; returns [n, 16] int32."""
        n, _ = self._advance_managed(self.options.max_length)
        frames = jax.device_get(self.state.frames)
        self.frames_emitted = n
        self._exhausted = True
        return np.asarray(frames[:n])

    def _dispatch_chunk_exact(self, target: int, emitted: int, chunk: int):
        """Dispatch one fused advance+decode program (no host read)."""
        self.state, self.vstate, wav_dev, n_dev, done_dev = (
            _advance_and_decode_chunk_exact(
                self.model.talker_params,
                self.model.cp_params,
                self.model.vocoder_params,
                self.model.config.talker,
                self.model.config.code_predictor,
                self.scfg,
                self.model.vocoder_config,
                self.state,
                self.vstate,
                self.trailing,
                self.trailing_len,
                self.pad_embed,
                self.uniforms,
                jnp.int32(target),
                jnp.int32(emitted),
                chunk,
                mesh=self.model.mesh,
            )
        )
        return wav_dev, n_dev, done_dev

    def run_to_audio(self) -> AudioBuffer:
        """Non-streaming synthesis as pipelined fused chunk programs.

        The dominant cost of the staged path (advance-to-completion, fetch
        frames, dispatch decode, fetch audio) on remote-attached TPUs is
        per-dispatch latency, not device time (~3.4 ms device prefill vs
        ~20 ms/dispatch measured through the tunnel). Here each fused
        advance+decode program is dispatched BEFORE the previous chunk's
        results are read — programs chain device-side through the donated
        carry, so the device never idles on a host round trip and the audio
        fetch of chunk k overlaps chunk k+1's execution. EOS is handled
        speculatively: a program dispatched past EOS no-ops its while_loop
        (state.done short-circuits) and its audio is discarded.

        Uses the sample-exact streaming vocoder, so output equals
        decode_codes(frames) up to matmul-tiling ulps (~1e-7 relative; see
        models/codec/vocoder.py). The reference has no such pipelined mode —
        its generate loop and decode are strictly serial (src/lib.rs:718-890).
        """
        if not self.options.streaming_exact or self._exhausted:
            frames = self.run_to_completion()
            prefix = self.prefix_codes
            if prefix is not None and len(prefix) and len(frames):
                # ICL prepend-and-proportional-cut (src/lib.rs:1022-1044) —
                # the streaming_exact path gets this via _feed_prefix instead.
                combined = np.concatenate(
                    [np.asarray(prefix, np.int32), frames], axis=0
                )
                audio = self.model.decode_codes(combined)
                cut = len(prefix) * len(audio) // max(len(combined), 1)
                return AudioBuffer(
                    audio.samples[min(cut, len(audio)):], audio.sample_rate
                )
            return self.model.decode_codes(frames)
        chunk = DECODE_BUCKET
        max_len = self.options.max_length
        if self._spec_frontier == 0 and self.frames_emitted == 0:
            prefix = (
                self.prefix_codes
                if self.prefix_codes is not None and len(self.prefix_codes)
                else None
            )
            self._ensure_vstate(len(prefix) if prefix is not None else 0)
            if prefix is not None:
                self._feed_prefix(np.asarray(prefix, np.int32), chunk)
        parts: list[np.ndarray] = []
        pending: list[tuple[int, object, object, object]] = []
        spec = self.frames_emitted  # dispatch frontier (frames)
        total: int | None = None  # true frame count once EOS/limit observed

        # Drain speculative chunk programs queued by earlier next_chunk()
        # calls (streaming_lookahead): their rows were never returned to the
        # caller and the stateful vocoder has already consumed them, so their
        # audio belongs at the head of this output.
        for e0, csz, w, nd, dd in self._pending:
            if total is not None and e0 >= total:
                continue
            wavp, n, done = jax.device_get((w, nd, dd))
            n, done = int(n), bool(done)
            emitted_here = min(n, e0 + csz) - e0
            if emitted_here > 0:
                parts.append(
                    np.asarray(wavp[0][: emitted_here * T.SAMPLES_PER_FRAME])
                )
            if done or n >= max_len:
                total = n if total is None else min(total, n)
        if self._pending:
            self._pending.clear()
            spec = self._spec_frontier

        def drain_one() -> None:
            nonlocal total
            e0, w, nd, dd = pending.pop(0)
            if total is not None and e0 >= total:
                return  # speculative program past EOS — discard
            wav, n, done = jax.device_get((w, nd, dd))
            n, done = int(n), bool(done)
            emitted_here = min(n, e0 + chunk) - e0
            if emitted_here > 0:
                parts.append(
                    np.asarray(wav[0][: emitted_here * T.SAMPLES_PER_FRAME])
                )
            if done or n >= max_len:
                total = n if total is None else min(total, n)

        while spec < max_len and total is None:
            target = min(spec + chunk, max_len)
            while self.state.frames.shape[0] < target:
                cap = self.state.frames.shape[0]
                new_cap = min(
                    next_bucket(cap + 1, buckets=FRAME_BUCKETS),
                    next_bucket(max_len, buckets=FRAME_BUCKETS),
                )
                if new_cap <= cap:
                    break
                self._grow(new_cap)
            pending.append((spec, *self._dispatch_chunk_exact(target, spec, chunk)))
            spec = target
            # Keep exactly one program in flight ahead of the read frontier.
            while len(pending) > 1:
                drain_one()
        while pending:
            drain_one()
        self.frames_emitted = total if total is not None else spec
        self._exhausted = True
        samples = (
            np.concatenate(parts) if parts else np.zeros(0, np.float32)
        )
        return AudioBuffer(samples, T.OUTPUT_SAMPLE_RATE)

    def next_chunk(self) -> AudioBuffer | None:
        """Generate + decode the next ~chunk_frames frames, or None when done.

        Default (options.streaming_exact): the vocoder carries causal state
        across chunks, so the concatenated stream is IDENTICAL to one-shot
        batch decode — one fused device program + one host fetch per chunk.
        Legacy mode decodes each chunk with chunk-local context only (the
        reference's streaming behavior: frame-count parity, not
        sample-identical, src/lib.rs:1650-1759).
        """
        if self._exhausted:
            return None
        chunk = max(self.options.chunk_frames, 1)
        if self.frames_emitted == 0 and self.options.first_chunk_frames:
            chunk = max(min(self.options.first_chunk_frames, chunk), 1)
        if self.options.streaming_exact:
            return self._next_chunk_exact(chunk)
        return self._next_chunk_legacy(chunk)

    def _dispatch_exact_ahead(self, chunk: int) -> None:
        """Queue one fused advance+decode program at the dispatch frontier.

        Growth, vocoder-state init and the ICL prefix feed all operate on
        device futures, so nothing here blocks on the device.
        """
        target = min(self._spec_frontier + chunk, self.options.max_length)
        # Pre-grow the frame/cache buffers so the fused program runs exactly
        # once per chunk (generate_frames only stops early at the buffer cap;
        # cap >= target means no mid-chunk re-entry, which would double-feed
        # the stateful vocoder).
        while self.state.frames.shape[0] < target:
            cap = self.state.frames.shape[0]
            new_cap = min(
                next_bucket(cap + 1, buckets=FRAME_BUCKETS),
                next_bucket(self.options.max_length, buckets=FRAME_BUCKETS),
            )
            if new_cap <= cap:
                break
            self._grow(new_cap)
        if self._spec_frontier == 0:
            prefix = (
                self.prefix_codes
                if self.prefix_codes is not None and len(self.prefix_codes)
                else None
            )
            self._ensure_vstate(len(prefix) if prefix is not None else 0)
            if prefix is not None:
                self._feed_prefix(np.asarray(prefix, np.int32), chunk)
        wav_dev, n_dev, done_dev = self._dispatch_chunk_exact(
            target, self._spec_frontier, chunk
        )
        self._pending.append((self._spec_frontier, chunk, wav_dev, n_dev, done_dev))
        self._spec_frontier = target

    def _next_chunk_exact(self, chunk: int) -> AudioBuffer | None:
        if not self._pending:
            self._dispatch_exact_ahead(chunk)
        # Speculative dispatch-ahead (journal R3.6): queue up to
        # streaming_lookahead further chunk programs BEFORE fetching this
        # one. Programs chain device-side through the donated carry, so the
        # device advances chunk k+1 while the host fetches (and the caller
        # plays) chunk k. A program dispatched past EOS no-ops its
        # while_loop (state.done short-circuits) and is discarded below.
        steady = max(self.options.chunk_frames, 1)
        while (
            len(self._pending) <= max(self.options.streaming_lookahead, 0)
            and self._spec_frontier < self.options.max_length
        ):
            self._dispatch_exact_ahead(steady)
        e0, csz, wav_dev, n_dev, done_dev = self._pending.pop(0)
        wav, n, done = jax.device_get((wav_dev, n_dev, done_dev))
        n, done = int(n), bool(done)
        done = done or n >= self.options.max_length
        if n <= e0:
            self._exhausted = True
            self._pending.clear()
            return None
        # The program ran with frame_limit == e0 + csz, so n <= e0 + csz.
        true_frames = n - e0
        self.frames_emitted = n
        if done:
            self._exhausted = True
            self._pending.clear()
        # Rows past ``n`` in the chunk were zero-code frames; they advanced
        # the (now-dead) vocoder state but their samples are trimmed here.
        samples = np.asarray(wav[0][: true_frames * T.SAMPLES_PER_FRAME])
        return AudioBuffer(samples, T.OUTPUT_SAMPLE_RATE)

    def _next_chunk_legacy(self, chunk: int) -> AudioBuffer | None:
        target = min(self.frames_emitted + chunk, self.options.max_length)
        first_chunk = self.frames_emitted == 0
        prefix = (
            self.prefix_codes
            if first_chunk and self.prefix_codes is not None and len(self.prefix_codes)
            else None
        )

        wav = None
        while True:
            if prefix is None:
                self.state, wav_dev, n_dev, done_dev = _advance_and_decode_chunk(
                    self.model.talker_params,
                    self.model.cp_params,
                    self.model.vocoder_params,
                    self.model.config.talker,
                    self.model.config.code_predictor,
                    self.scfg,
                    self.model.vocoder_config,
                    self.state,
                    self.trailing,
                    self.trailing_len,
                    self.pad_embed,
                    self.uniforms,
                    jnp.int32(target),
                    jnp.int32(self.frames_emitted),
                    chunk,
                    mesh=self.model.mesh,
                )
                wav, n, done = jax.device_get((wav_dev, n_dev, done_dev))
                frames = None
            else:
                self._advance(target)
                frames, n, done = jax.device_get(
                    (self.state.frames, self.state.frame_idx, self.state.done)
                )
            n, done = int(n), bool(done)
            cap = self.state.frames.shape[0]
            if done or n >= target or n < cap:
                break
            new_cap = min(
                next_bucket(cap + 1, buckets=FRAME_BUCKETS),
                next_bucket(self.options.max_length, buckets=FRAME_BUCKETS),
            )
            if new_cap <= cap:
                break
            self._grow(new_cap)
        done = done or n >= self.options.max_length
        if n <= self.frames_emitted:
            self._exhausted = True
            return None
        true_frames = n - self.frames_emitted
        emitted_before = self.frames_emitted
        self.frames_emitted = n
        if done:
            self._exhausted = True
        if prefix is None:
            cap = self.state.frames.shape[0]
            if emitted_before + chunk > cap:
                # Rare: EOS at a growth-tier edge where the on-device chunk
                # slice would have clamped (start = cap - chunk) — re-decode
                # the true rows host-side instead of using misaligned audio.
                frames = jax.device_get(self.state.frames)
                new = np.asarray(frames[emitted_before:n])
                wavb = vocoder.decode_bucketed(
                    self.model.vocoder_params,
                    self.model.vocoder_config,
                    self.model.codes_to_tensor(new),
                    bucket=chunk,
                )
                return AudioBuffer(wavb[0], T.OUTPUT_SAMPLE_RATE)
            # Fused path: wav covers rows [emitted, emitted + chunk); rows
            # past ``n`` were zeros and the stack is causal, so trimming to
            # the true frame count is exact.
            samples = np.asarray(wav[0][: true_frames * T.SAMPLES_PER_FRAME])
            return AudioBuffer(samples, T.OUTPUT_SAMPLE_RATE)
        # Voice-clone first chunk: decode [ref || chunk], emit only the chunk
        # (exact front cut — the vocoder is causal, 1920 samples/frame).
        new = np.asarray(frames[emitted_before:n])
        decode_frames = np.concatenate([np.asarray(prefix, np.int32), new], axis=0)
        cut = len(prefix) * T.SAMPLES_PER_FRAME
        wav = vocoder.decode_bucketed(
            self.model.vocoder_params,
            self.model.vocoder_config,
            self.model.codes_to_tensor(decode_frames),
            bucket=chunk,
        )
        return AudioBuffer(wav[0][cut:], T.OUTPUT_SAMPLE_RATE)

    def __iter__(self):
        return self

    def __next__(self) -> AudioBuffer:
        chunk = self.next_chunk()
        if chunk is None:
            raise StopIteration
        return chunk


class StreamingBatchSession:
    """Pull-based streaming for a BATCH of utterances (one program per chunk).

    ``next_chunks()`` returns ``[AudioBuffer | None] * B``: each live stream's
    next chunk of samples, ``None`` once that stream is exhausted. All streams
    advance together through one vmapped while_loop + one batch-native
    streaming-vocoder pass, so the bandwidth-bound weight streaming is
    amortized across the batch (near-B x aggregate streaming throughput; the
    reference is strictly batch-1, kv_cache.rs:262). Streams that hit EOS
    early freeze in the loop and emit ``None`` while the rest continue.

    Always sample-exact (the batched vocoder carries per-stream causal state):
    each stream's concatenated chunks equal its ``synthesize_batch`` audio.
    ``options.streaming_lookahead`` chunk programs are kept speculatively in
    flight, exactly as in the single-stream session (journal R3.6).

    Buffers are preallocated at the max_length bucket (throughput mode, like
    ``synthesize_batch``) — no growth tiers: one program shape per chunk size.
    """

    def __init__(self, model, states, scfg, options, trailing, trailing_lens,
                 pad_embed, uniforms, frame_limits=None, refs=None):
        self.model = model
        self.states = states
        self.scfg = scfg
        self.options = options
        self.trailing = trailing
        self.trailing_lens = trailing_lens
        self.pad_embed = pad_embed
        self.uniforms = uniforms
        self.batch = int(states.frames.shape[0])
        self.frames_emitted = 0
        self._exhausted = False
        self._stream_done = [False] * self.batch
        # Per-stream generation budgets (ICL streams carry their own caps).
        if frame_limits is None:
            frame_limits = jnp.full((self.batch,), options.max_length, jnp.int32)
        self.frame_limits = frame_limits
        self._per_max = np.asarray(jax.device_get(frame_limits), np.int64)
        # ICL reference prefixes: each stream's vocoder timeline is
        # [ref_codes || generated frames] (see _advance_and_decode_chunk_batch).
        refs = refs or [None] * self.batch
        self._ref_lens_np = np.array(
            [0 if r is None else len(r) for r in refs], np.int64
        )
        cmax = int(self._ref_lens_np.max())
        if cmax > 0:
            ref_arr = np.zeros((self.batch, cmax, 16), np.int32)
            for i, r in enumerate(refs):
                if r is not None:
                    ref_arr[i, : len(r)] = r
            self.ref_codes = jnp.asarray(ref_arr)
            self.ref_lens = jnp.asarray(self._ref_lens_np, jnp.int32)
        else:
            self.ref_codes = None
            self.ref_lens = None
        # Grid bound: every stream's reference prefix plus its own budget.
        self._grid_max = int((self._ref_lens_np + self._per_max).max())
        # KV headroom: the final chunk's fixed-size slice may extend past the
        # frame bucket (rows are zeros, audio trimmed); size the vocoder cache
        # so its append never clamps.
        headroom = max(options.chunk_frames, options.first_chunk_frames or 1, 1)
        self.vstate = vocoder.init_stream_state(
            model.vocoder_config,
            max_frames=int(states.frames.shape[1]) + cmax + headroom,
            batch=self.batch,
        )
        # Speculative in-flight chunk programs: (start_frame, chunk, wav, n, done).
        self._pending: list[tuple[int, int, object, object, object]] = []
        self._spec_frontier = 0

    def is_done(self) -> bool:
        return self._exhausted

    def _dispatch_ahead(self, chunk: int) -> None:
        target = min(self._spec_frontier + chunk, self._grid_max)
        self.states, self.vstate, wav_dev, n_dev, done_dev = (
            _advance_and_decode_chunk_batch(
                self.model.talker_params,
                self.model.cp_params,
                self.model.vocoder_params,
                self.model.config.talker,
                self.model.config.code_predictor,
                self.scfg,
                self.model.vocoder_config,
                self.states,
                self.vstate,
                self.trailing,
                self.trailing_lens,
                self.pad_embed,
                self.uniforms,
                jnp.minimum(self.frame_limits, jnp.int32(target)),
                jnp.int32(self._spec_frontier),
                chunk,
                ref_codes=self.ref_codes,
                ref_lens=self.ref_lens,
                mesh=self.model.mesh,
                w8a8=self.model.w8a8,
            )
        )
        self._pending.append((self._spec_frontier, chunk, wav_dev, n_dev, done_dev))
        self._spec_frontier = target

    def next_chunks(self) -> list[AudioBuffer | None] | None:
        """Advance all live streams one chunk; None when every stream is done.

        ICL streams' early chunks may be empty buffers while the shared
        vocoder grid is still inside their reference prefix (the prefix
        samples are trimmed here, never emitted).
        """
        if self._exhausted:
            return None
        chunk = max(self.options.chunk_frames, 1)
        if self.frames_emitted == 0 and self.options.first_chunk_frames:
            chunk = max(min(self.options.first_chunk_frames, chunk), 1)
        if not self._pending:
            self._dispatch_ahead(chunk)
        steady = max(self.options.chunk_frames, 1)
        while (
            len(self._pending) <= max(self.options.streaming_lookahead, 0)
            and self._spec_frontier < self._grid_max
        ):
            self._dispatch_ahead(steady)
        e0, csz, wav_dev, n_dev, done_dev = self._pending.pop(0)
        wav, ns, dones = jax.device_get((wav_dev, n_dev, done_dev))
        ns, dones = np.asarray(ns), np.asarray(dones)
        spf = T.SAMPLES_PER_FRAME
        out: list[AudioBuffer | None] = []
        for i in range(self.batch):
            n_i = int(ns[i])
            tr = int(self._ref_lens_np[i])
            n_grid = tr + n_i
            done_i = bool(dones[i]) or n_i >= int(self._per_max[i])
            if self._stream_done[i] or n_grid <= e0:
                self._stream_done[i] = True
                out.append(None)
                continue
            # Audible window: grid rows past this stream's reference prefix.
            # The program ran with frame_limit <= e0 + csz, so n_grid's
            # in-window part is fully decoded.
            lo = max(e0, tr)
            hi = min(e0 + csz, n_grid)
            samples = (
                np.asarray(wav[i][(lo - e0) * spf : (hi - e0) * spf])
                if hi > lo
                else np.zeros(0, np.float32)
            )
            out.append(AudioBuffer(samples, T.OUTPUT_SAMPLE_RATE))
            if done_i and n_grid <= e0 + csz:
                self._stream_done[i] = True
        self.frames_emitted = e0 + csz
        if all(self._stream_done) or (
            self._spec_frontier >= self._grid_max and not self._pending
        ):
            self._exhausted = True
            self._pending.clear()
        return out

    def __iter__(self):
        return self

    def __next__(self) -> list[AudioBuffer | None]:
        chunks = self.next_chunks()
        if chunks is None:
            raise StopIteration
        return chunks
