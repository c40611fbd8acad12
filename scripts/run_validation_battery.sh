#!/bin/bash
# Round-5 validation battery (VERDICT r4 asks #2-#4): runs each recorder
# sequentially on the TPU and logs to /tmp/val_*.out. Invoke from the
# repo root.
set -x
cd "$(dirname "$0")/.."

# DSHGI golden, re-measured after the round-4 fused-bake rewrite.
# NOTE: the build host has ONE CPU core — on a cold compile cache the
# bake + raster compiles alone exceed 2400 s. Run nothing else
# concurrently and give it an hour.
timeout 3600 python scripts/validate_render.py --renderer=dshgi \
    > /tmp/val_dshgi.out 2>&1
echo "dshgi rc=$?" >> /tmp/val_dshgi.out

# ReSTIR + hybrid vs converged PT at 256^2
timeout 2400 python - > /tmp/val_restir.out 2>&1 <<'EOF'
import sys
sys.path.insert(0, "scripts"); sys.path.insert(0, ".")
from validate_render import validate_restir_vs_pt
for hybrid in (False, True):
    rc = validate_restir_vs_pt("/root/reference/test/test.glb",
                               256, 256, 1e9, hybrid=hybrid)
    print("hybrid" if hybrid else "plain", "rc", rc)
EOF
echo "restir rc=$?" >> /tmp/val_restir.out

# PT golden colored-Fresnel proof (subprocess renders, 512^2 x 256 spp)
timeout 3000 python scripts/pt_deficit_proof.py > /tmp/val_ptproof.out 2>&1
echo "ptproof rc=$?" >> /tmp/val_ptproof.out

echo ALL DONE
