"""Pallas TPU kernels (fused NTT stage chains, challenge select)."""


def pallas_interpret() -> bool:
    """Interpret-mode flag for every Pallas call site: real Mosaic on TPU
    backends (incl. the tunneled "axon" backend, whose platform name is not
    "tpu"), interpreter on CPU so the RINGZK_PALLAS* flags stay testable on
    the virtual-device mesh. Single source of truth -- a backend whose
    platform name is neither must be classified here, not per call site."""
    import jax

    return jax.default_backend() == "cpu"
