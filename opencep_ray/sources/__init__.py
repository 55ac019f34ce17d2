from .transcripts import SCHEMA, synth_transcripts, text_v, write_transcripts  # noqa: F401
