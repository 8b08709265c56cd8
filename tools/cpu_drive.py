"""Drive any CLI entry script on the CPU backend, in-process.

The axon sitecustomize force-registers the TPU platform and its
``get_backend`` hook creates the relay client even under
``JAX_PLATFORMS=cpu`` — if the relay is slow or down, a plain
subprocess-env drive hangs before ``main()`` runs.  Forcing the platform
through ``jax.config`` BEFORE any backend use is the only robust way
(verify skill, r3).

Usage: python tools/cpu_drive.py inference_img.py --config cfg.yaml ...
"""
import importlib.util
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

script = sys.argv[1]
sys.argv = sys.argv[1:]
# entry scripts import seervideoldm_tpu relative to their own directory
sys.path.insert(0, os.path.dirname(os.path.abspath(script)) or ".")
spec = importlib.util.spec_from_file_location("__main__", script)
module = importlib.util.module_from_spec(spec)
sys.modules["__main__"] = module
spec.loader.exec_module(module)
