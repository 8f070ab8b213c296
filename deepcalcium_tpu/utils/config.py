"""Config system.

Behavioral parity with the reference config layer (``utils/config.py:7-38``):
a JSON file holding ``datasets_dir`` and ``checkpoints_dir``, auto-created on
first use, with both directories mkdir'ed.

Differences from the reference (deliberate):
- No import-time side effects: directories are created lazily on first call to
  :func:`get_config`, and ``DATASETS_DIR`` / ``CHECKPOINTS_DIR`` are resolved
  through functions so tests can redirect them with ``DEEPCALCIUM_TPU_DIR``.
- Env-var override ``DEEPCALCIUM_TPU_DIR`` points the whole tree somewhere
  else (used heavily by the test suite and CI).
"""

import json
import os


def base_dir() -> str:
    """Root directory for config, datasets, and checkpoints."""
    env = os.environ.get("DEEPCALCIUM_TPU_DIR")
    if env:
        return env
    return os.path.join(os.path.expanduser("~"), ".deep-calcium-tpu")


def config_path() -> str:
    return os.path.join(base_dir(), "deep-calcium-tpu.json")


def get_config() -> dict:
    """Return config contents, creating the file and directories if needed."""
    bd = base_dir()
    os.makedirs(bd, exist_ok=True)
    cp = config_path()
    if not os.path.exists(cp):
        config = {
            "datasets_dir": os.path.join(bd, "datasets"),
            "checkpoints_dir": os.path.join(bd, "checkpoints"),
        }
        # tmp+rename: a crash mid-write must not leave a truncated JSON
        # that bricks every later get_config() call.
        tmp = cp + ".tmp"
        with open(tmp, "w") as fp:
            json.dump(config, fp)
        os.replace(tmp, cp)
    else:
        try:
            with open(cp, "r") as fp:
                config = json.load(fp)
        except json.JSONDecodeError as e:
            raise RuntimeError(
                f"config file {cp} is corrupt ({e}); delete it to "
                f"regenerate defaults") from e
    os.makedirs(config["datasets_dir"], exist_ok=True)
    os.makedirs(config["checkpoints_dir"], exist_ok=True)
    return config


def datasets_dir() -> str:
    return get_config()["datasets_dir"]


def checkpoints_dir() -> str:
    return get_config()["checkpoints_dir"]
