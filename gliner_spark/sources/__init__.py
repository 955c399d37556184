from .transcripts import synth_transcripts, TRANSCRIPT_SCHEMA  # noqa: F401
