#!/bin/bash
# Build the RNG-tape recorder (tools/tape_driver.cpp). The recorder needs a
# hook inside cpu::Random::generate(); the reference tree is read-only, so
# Random.cpp is copied to a scratch dir and the hook is inserted there (two
# lines: an extern declaration and a call before generate()'s return).
set -e
REF=/root/reference
OUT=${1:-/root/repo/tools/tape_driver}
WORK=$(mktemp -d /tmp/kajo_tape_build.XXXXXX)
trap 'rm -rf "$WORK"' EXIT

sed -e '1i #include <glm/glm.hpp>\nextern void (*kajo_tape_hook)(const glm::vec4&);' \
    -e '0,/    return result;/s//    if (kajo_tape_hook) kajo_tape_hook(result);\n    return result;/' \
    "$REF/renderer/cpu/Random.cpp" > "$WORK/Random.cpp"

g++ -std=c++17 -O3 -ffast-math -march=native -mtune=native -DUSE_SSE2 \
    -DGLM_FORCE_CXX11 -DGLM_SWIZZLE -Wno-register \
    -I"$REF" -I"$REF/renderer/cpu" -I"$REF/third_party/glm" -I"$REF/third_party/SimpleJSON/src" \
    /root/repo/tools/tape_driver.cpp \
    "$REF/scene/Scene.cpp" "$REF/scene/Parser.cpp" \
    "$REF/renderer/cpu/Scene.cpp" "$REF/renderer/cpu/Raytracer.cpp" \
    "$REF/renderer/cpu/Shader.cpp" "$REF/renderer/cpu/BSDF.cpp" \
    "$REF/renderer/cpu/Light.cpp" "$WORK/Random.cpp" \
    "$REF/renderer/cpu/Ray.cpp" "$REF/renderer/cpu/SurfacePoint.cpp" \
    "$REF/third_party/SimpleJSON/src/JSON.cpp" "$REF/third_party/SimpleJSON/src/JSONValue.cpp" \
    -lpthread -o "$OUT"
echo "built $OUT"
