from fftisdf_tpu.ops.pallas_gram import pair_gram_sq  # noqa: F401
