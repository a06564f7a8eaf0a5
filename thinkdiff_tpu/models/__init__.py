from thinkdiff_tpu.models import aligner_clip, aligner_lvlm  # noqa: F401 (registry)
from thinkdiff_tpu.models.aligner_clip import BlipVisionT5Decoder
from thinkdiff_tpu.models.aligner_lvlm import (
    MllamaT5EmbedDecoder, MllamaT5EmbedDecoderWithEngine,
)
from thinkdiff_tpu.models.t5 import T5Config, T5ForConditionalGeneration
from thinkdiff_tpu.models.vit import ViTConfig, VisionTransformer
