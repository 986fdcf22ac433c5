from .exact import dec, dec_avg, dec_sum, pct, rnd  # noqa: F401
