"""Early pytest bootstrap: re-exec without the axon TPU plugin trigger.

The environment's sitecustomize registers the axon PJRT plugin at
interpreter start whenever PALLAS_AXON_POOL_IPS is set; registration
itself can hang or fail when the TPU relay is down, taking the CPU test
suite with it (round-2 outage post-mortem).  The fix is to re-exec the
test process once with the trigger variable removed.

This must happen HERE — a `-p` plugin imported during pytest's option
preparse — and not in tests/conftest.py: by conftest-load time pytest's
fd-level capture has already replaced fd 1/2 with a tempfile, so an
exec'd child inherits the redirected fds and its entire terminal output
dies with the parent's never-read capture file (measured: `pytest -q`
printed nothing at all, rc=0).  Plugins from addopts load before the
capture manager starts, so the child keeps the real stdout.

Loaded via pytest.ini `addopts = -p _pytest_boot`; run pytest from the
repo root (the module resolves off sys.path, which `python -m pytest`
seeds with the cwd).
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
    "_DIFFSOUND_TEST_REEXEC"
):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["_DIFFSOUND_TEST_REEXEC"] = "1"
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
