"""Model zoo: backbones, heads, decode, losses.

Factory mirrors reference lib/models/model.py:17-24 (`_model_factory`).
"""

from .factory import create_model, MODEL_FACTORY  # noqa: F401
