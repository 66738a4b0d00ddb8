"""Test configuration: force an 8-device CPU platform before any computation.

Multi-chip sharding paths are exercised on virtual CPU devices
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``); float64 is enabled
so differential tests against the numpy oracles can run at reference
precision (the reference is float64 end-to-end).

The session may pre-register a TPU backend (sitecustomize) and force
``jax_platforms`` via config, so an env var is not enough — we update the
jax config itself.  Set ``BAPP_TEST_TPU=1`` to run the suite on the real
TPU backend instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

_use_tpu = os.environ.get("BAPP_TEST_TPU") == "1"
if not _use_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _use_tpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
