#!/bin/sh
# Build the native extension into the package as evossearch_tpu/_native.so.
set -e
cd "$(dirname "$0")"
PY_INCLUDE=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT_SUFFIX=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -I"$PY_INCLUDE" \
    evossearch_native.cpp \
    -ljpeg -lpthread \
    -o "../evossearch_tpu/_native$EXT_SUFFIX"
echo "built evossearch_tpu/_native$EXT_SUFFIX"
