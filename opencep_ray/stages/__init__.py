from . import ann, dedup, multimodal, text, windows  # noqa: F401
