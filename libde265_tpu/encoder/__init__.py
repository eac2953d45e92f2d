"""Encoder subsystem (en265-equivalent capability)."""
from .encoder import Encoder, EncoderConfig
