from tits_spark.sources.tick_source import parse_ticks, read_tick_file, write_correlogram_tsv

__all__ = ["parse_ticks", "read_tick_file", "write_correlogram_tsv"]
