"""Build the native host-side components (csrc/) with g++.

Usage: python setup_native.py
Produces csrc/build/libpolyiou.so, auto-discovered by
orientedreppoints_tpu.devkit.polygon.
"""

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent


def main():
    res = subprocess.run(
        ["make", "-C", str(HERE / "csrc")], capture_output=True, text=True
    )
    sys.stdout.write(res.stdout)
    sys.stderr.write(res.stderr)
    if res.returncode != 0:
        sys.exit(res.returncode)
    print("native components built:", HERE / "csrc/build/libpolyiou.so")


if __name__ == "__main__":
    main()
