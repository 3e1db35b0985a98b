"""Crash rail (system_signal_handling.c analog): faulthandler + crash
breadcrumbs printed on unhandled exceptions."""

import subprocess
import sys


def test_breadcrumbs_roundtrip():
    from ansel_tpu.core import crash

    crash.breadcrumb("image", "/x/y.nef")
    crash.breadcrumb("pipe", "export")
    assert crash.breadcrumbs() == {"image": "/x/y.nef", "pipe": "export"}
    crash.breadcrumb("pipe", None)
    assert "pipe" not in crash.breadcrumbs()


def test_excepthook_prints_context():
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
        "from ansel_tpu.core import crash\n"
        "crash.install()\n"
        "crash.breadcrumb('image', '/roll/IMG_0042.NEF')\n"
        "raise RuntimeError('boom')\n"
    )
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True)
    assert r.returncode != 0
    assert "processing context" in r.stderr
    assert "IMG_0042.NEF" in r.stderr
    assert "boom" in r.stderr


def test_faulthandler_dumps_on_fatal_signal():
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
        "from ansel_tpu.core import crash\n"
        "crash.install()\n"
        "import ctypes; ctypes.string_at(0)\n"  # SIGSEGV
    )
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True)
    assert r.returncode != 0
    assert "Fatal Python error" in r.stderr or "Segmentation" in r.stderr
