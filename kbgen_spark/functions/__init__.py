from kbgen_spark.functions.hashing import det_uniform, salt_col
from kbgen_spark.functions.text import char_ngrams, norm_surface, tokens

__all__ = ["det_uniform", "salt_col", "tokens", "norm_surface", "char_ngrams"]
