"""Build hook: compile the C++ runtime pieces (native/*.cc -> package .so)
before packaging, so `pip install .` ships working native loaders.

The libraries are plain `g++ -shared` artifacts loaded via ctypes
(gcn_song_embeddings_tpu/native/{jsongraph,featload}.py), not CPython
extensions, so we drive the native/Makefile rather than setuptools'
Extension machinery (which would mangle the .so names).  Every native
consumer has a pure-Python fallback, so a missing toolchain degrades to a
slower-but-correct install instead of a failed one.
"""

import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        try:
            subprocess.run(["make", "-C", "native"], check=True)
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"WARNING: native build skipped ({e}); "
                  "pure-Python fallbacks will be used", file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
