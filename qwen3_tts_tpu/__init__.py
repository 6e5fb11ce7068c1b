"""qwen3_tts_tpu — TPU-native Qwen3-TTS inference framework (JAX/XLA/Pallas).

A ground-up rebuild of the qwen3-tts-rs inference engine for TPU: the
autoregressive talker + code-predictor loop compiles to a single XLA program
with zero per-frame host syncs, the BigVGAN-style vocoder lowers to fused
channels-last convolutions, and all five official model variants (0.6B/1.7B
Base / CustomVoice, 1.7B VoiceDesign) are supported, including x-vector and
ICL voice cloning and chunked streaming synthesis.
"""

import os as _os

if _os.environ.get("QWEN3_TTS_PLATFORM"):
    # Explicit backend pin (e.g. QWEN3_TTS_PLATFORM=cpu for the parity drill
    # or CI). Needed because this environment's sitecustomize re-pins
    # JAX_PLATFORMS at interpreter startup, so the plain env var cannot be
    # overridden from a shell; jax.config still can be, pre-backend-init.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["QWEN3_TTS_PLATFORM"])

from .audio.io import AudioBuffer, load_wav, save_wav
from .audio.resample import resample, resample_to_24k
from .models import tokens
from .models.config import (
    CodePredictorConfig,
    ModelConfig,
    ModelType,
    SpeakerEncoderConfig,
    TalkerConfig,
    config_for_variant,
    parse_config_json,
)
from .models.tokens import CODEC_EOS as CODEC_EOS_TOKEN_ID
from .models.tokens import SAMPLES_PER_FRAME
from .ops.sampling import SamplingConfig
from .pipeline import (
    Qwen3TTS,
    StreamingSession,
    SynthesisOptions,
    SynthesisTiming,
    VoiceClonePrompt,
)
from .tokenizer import TextTokenizer

__version__ = "0.1.0"

__all__ = [
    "AudioBuffer",
    "CODEC_EOS_TOKEN_ID",
    "CodePredictorConfig",
    "ModelConfig",
    "ModelType",
    "Qwen3TTS",
    "SAMPLES_PER_FRAME",
    "SamplingConfig",
    "SpeakerEncoderConfig",
    "StreamingSession",
    "SynthesisOptions",
    "SynthesisTiming",
    "TalkerConfig",
    "TextTokenizer",
    "VoiceClonePrompt",
    "config_for_variant",
    "load_wav",
    "parse_config_json",
    "resample",
    "resample_to_24k",
    "save_wav",
    "tokens",
]
