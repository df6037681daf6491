"""Encoder models.

Replaces the reference's torch/CUDA embedding stage (SURVEY.md §2 #4-5:
`sidecar-search build` running NovaSearch/stella_en_1.5B_v5 with
batch 32 on an RTX 3060 / 4xL4, reference README.md:33,60) with a JAX
flax implementation that serves both corpus builds and live queries on
TPU.
"""

from .qwen2 import Qwen2Config, Qwen2Encoder
from .stella import StellaConfig, StellaEncoder, PROMPTS

__all__ = ["Qwen2Config", "Qwen2Encoder", "StellaConfig", "StellaEncoder", "PROMPTS"]
