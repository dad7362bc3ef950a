from tits_spark.datagen.transcripts import TRANSCRIPT_SCHEMA, generate_transcripts
from tits_spark.datagen.quotes import generate_quotes

__all__ = ["TRANSCRIPT_SCHEMA", "generate_transcripts", "generate_quotes"]
