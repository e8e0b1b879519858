#!/usr/bin/env bash
# Build + install story for vit-fpga-tpu (the role install_VIT_FPGA.sh
# plays in the reference: environment setup, build, artifact install).
#
# Usage: scripts/install.sh [--prefix DIR] [--sanitize thread|address]
set -euo pipefail
cd "$(dirname "$0")/.."

PREFIX="${HOME}/.local"
SANITIZE=""
while [[ $# -gt 0 ]]; do
  case "$1" in
    --prefix) PREFIX="$2"; shift 2 ;;
    --sanitize) SANITIZE="$2"; shift 2 ;;
    *) echo "unknown arg $1"; exit 2 ;;
  esac
done

echo "== building native runtime =="
CMAKE_ARGS=(-S native -B native/build -G Ninja)
if [[ -n "${SANITIZE}" ]]; then
  CMAKE_ARGS+=("-DVFT_SANITIZE=${SANITIZE}")
fi
cmake "${CMAKE_ARGS[@]}"
ninja -C native/build

echo "== native tests =="
./native/build/net_native_test

echo "== python tests =="
python -m pytest tests/ -x -q

echo "== installing =="
mkdir -p "${PREFIX}/lib" "${PREFIX}/include/vit_fpga_tpu"
cp native/build/libnet_tpu.so "${PREFIX}/lib/"
cp native/include/*.h "${PREFIX}/include/vit_fpga_tpu/"
echo "installed libnet_tpu.so -> ${PREFIX}/lib, headers -> ${PREFIX}/include/vit_fpga_tpu"
echo "python package: add $(pwd) to PYTHONPATH or 'pip install -e .'"
