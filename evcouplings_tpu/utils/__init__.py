from evcouplings_tpu import BailoutException  # noqa: F401
