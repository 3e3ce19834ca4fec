"""Test harness config: run the suite on a virtual 8-device CPU mesh so CI
needs no TPU (SURVEY.md §4); sharding tests exercise the same pjit paths the
driver validates via __graft_entry__.dryrun_multichip.

Note: the environment may pre-register an external TPU plugin and pin
JAX_PLATFORMS; overriding the config after import is the reliable way to
pin tests to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache (VERDICT r2 weak #5): the suite's cost is
# dominated by recompiling large march/shade programs per parametrization;
# with the cache, reruns compile-hit in milliseconds.  Safe across
# processes (content-addressed); .gitignore'd.
# Tests get their OWN cache dir, separate from the TPU bench/scripts'
# .jax_cache: the two share no entries (different platforms) and a test
# run concurrent with a bench once corrupted a shared entry — jax
# segfaults in compilation_cache.get_executable_and_time deserializing a
# torn cache file, which would also kill the driver's bench run.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                          ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
