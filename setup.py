"""Build hook: compile the C++ runtime pieces (native/*.cc -> package .so)
before packaging, so `pip install .` ships working native loaders.

The libraries are plain `g++ -shared` artifacts loaded via ctypes
(gcn_song_embeddings_tpu/native/{jsongraph,featload}.py), not CPython
extensions, so we drive the native/Makefile rather than setuptools'
Extension machinery (which would mangle the .so names).  Every native
consumer has a pure-Python fallback, so a missing toolchain degrades to a
slower-but-correct install instead of a failed one.
"""

import os
import subprocess
import sys

from setuptools import Distribution, setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        makefile = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "native", "Makefile")
        try:
            if not os.path.isfile(makefile):
                raise OSError("native/ sources missing from this sdist")
            subprocess.run(["make", "-C", os.path.dirname(makefile)],
                           check=True)
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"WARNING: native build skipped ({e}); "
                  "pure-Python fallbacks will be used", file=sys.stderr)
        super().run()


class BinaryDistribution(Distribution):
    """The package ships ctypes .so files built from native/*.cc, so wheels
    must carry a platform tag (a py3-none-any wheel copied to another OS
    would load linux-x86 libraries and fail)."""

    def has_ext_modules(self):
        return True


setup(cmdclass={"build_py": BuildWithNative},
      distclass=BinaryDistribution)
