#!/bin/bash
# Build the headless reference oracle (tools/ref_driver.cpp) against the
# read-only reference sources. Output: /root/repo/tools/ref_driver
set -e
REF=/root/reference
OUT=${1:-/root/repo/tools/ref_driver}
g++ -std=c++17 -O3 -ffast-math -march=native -mtune=native -DUSE_SSE2 \
    -DGLM_FORCE_CXX11 -DGLM_SWIZZLE -Wno-register \
    -I"$REF" -I"$REF/third_party/glm" -I"$REF/third_party/SimpleJSON/src" \
    /root/repo/tools/ref_driver.cpp \
    "$REF/scene/Scene.cpp" "$REF/scene/Parser.cpp" \
    "$REF/renderer/cpu/Scene.cpp" "$REF/renderer/cpu/Raytracer.cpp" \
    "$REF/renderer/cpu/Shader.cpp" "$REF/renderer/cpu/BSDF.cpp" \
    "$REF/renderer/cpu/Light.cpp" "$REF/renderer/cpu/Random.cpp" \
    "$REF/renderer/cpu/Ray.cpp" "$REF/renderer/cpu/SurfacePoint.cpp" \
    "$REF/third_party/SimpleJSON/src/JSON.cpp" "$REF/third_party/SimpleJSON/src/JSONValue.cpp" \
    -lpthread -o "$OUT"
echo "built $OUT"
