"""Build the native extension in-place (g++, CPython C API, no pybind11).

Invoked lazily by gslidar_tpu.native on first import; the resulting .so is
cached next to this file.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "gslidar_native.cpp")
OUT = os.path.join(HERE, "gslidar_native.so")


def build(force: bool = False) -> str:
    if (not force and os.path.exists(OUT)
            and os.path.getmtime(OUT) >= os.path.getmtime(SRC)):
        return OUT
    py_inc = sysconfig.get_paths()["include"]
    np_inc = np.get_include()
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{py_inc}", f"-I{np_inc}", SRC, "-o", OUT]
    subprocess.run(cmd, check=True)
    return OUT
