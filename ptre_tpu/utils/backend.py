"""Backend/platform detection, centralized.

Every "are we on a TPU?" decision in the library routes through
:func:`is_tpu_backend` so alternative platform names (some deployments
expose the TPU under a vendor-specific platform string) are handled in
exactly one place. The recognized names can be extended without a code
change via the ``PTRE_TPU_PLATFORMS`` environment variable
(comma-separated extra platform names to treat as TPU) — and
``PTRE_FORCE_BACKEND=tpu|cpu`` overrides detection outright, which the
tests use to pin a route regardless of the host.

The reference has no analogue (it is compiled for exactly one backend,
``compute_75,sm_75`` — `IoniqRE.vcxproj`); this helper is where the
TPU-native build keeps its single runtime backend switch.
"""

from __future__ import annotations

import os

import jax

#: platform names treated as "a real TPU" for kernel routing. "tpu" is
#: upstream JAX; "axon" is a tunneled single-chip TPU platform some dev
#: environments expose (it runs the same Mosaic/Pallas stack). Extra names
#: come from PTRE_TPU_PLATFORMS (comma-separated).
_TPU_PLATFORMS = ("tpu", "axon")


def tpu_platform_names() -> tuple:
    extra = os.environ.get("PTRE_TPU_PLATFORMS", "")
    names = _TPU_PLATFORMS + tuple(
        n.strip() for n in extra.split(",") if n.strip())
    return names


def is_tpu_backend() -> bool:
    """True when the default JAX backend is a TPU (or a platform the user
    declared TPU-equivalent). Controls Pallas-vs-XLA kernel routing."""
    forced = os.environ.get("PTRE_FORCE_BACKEND", "")
    if forced:
        return forced.lower() == "tpu"
    return jax.default_backend() in tpu_platform_names()
