"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (including transitively via the
package under test), so this executes at conftest import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override: the session env may point at the TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Keep single-core CPU runs deterministic and quiet.
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize registers the TPU backend at interpreter startup (before this
# file runs), so the env var alone is not enough — force the platform via jax.config
# before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA recompiles on this
# 1-core box; cache compiled programs across runs (shapes are deterministic).
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
