#!/usr/bin/env bash
# Standing real-pretrained-weights validation (round-4 VERDICT missing #1).
#
# Every parity proof in tests/ runs against randomly-initialized reference
# models because the build environment has zero network egress. This script
# is the end-to-end check to run the moment an environment HAS egress:
# BASELINE config #2 with actual laion400m_e32 weights through the full
# download -> sha256 -> convert -> zero-shot -> --save-embed chain, plus a
# logits comparison against the PyTorch reference if it is importable.
# Reference analogue: /root/reference/pathmnist_test.sh +
# src/open_clip/pretrained.py:418-613 (download/sha256 registry).
#
# Usage: tools/real_weights_smoke.sh [VAL_DIR]
#   VAL_DIR: PathMNIST val images ({class}-{id}.tif dirlist); omitted ->
#            the zero-shot eval step is skipped and only the weight chain
#            plus the logit parity probe run.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

# 1. egress gate: fail fast with a clear message on a sealed box
python - <<'EOF'
import socket, sys
try:
    socket.create_connection(("huggingface.co", 443), timeout=5).close()
except OSError as e:
    sys.exit(f"no network egress ({e}); this smoke needs it. "
             "On the sealed build box this script is expected to stop here.")
print("egress: ok")
EOF

# 2. download (sha256-verified by pretrained.py) + convert + encode
python - <<'EOF'
import numpy as np, jax.numpy as jnp
from xtagclip_tpu.factory import create_model_and_transforms

model, _, pp_val = create_model_and_transforms(
    "ViT-B-32", pretrained="laion400m_e32")
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (2, 224, 224, 3)), jnp.float32)
feats, _ = model.encode_image(x, normalize=True)
print("weights loaded + encode_image ok:", feats.shape)

# 3. logit parity vs the PyTorch reference, if available
try:
    import torch, open_clip  # noqa: F401
except ImportError:
    print("PyTorch open_clip not importable here - parity step skipped "
          "(run from an env with the reference installed to pin <=1e-3)")
else:
    ref, _, _ = open_clip.create_model_and_transforms(
        "ViT-B-32", pretrained="laion400m_e32")
    ref.eval()
    with torch.no_grad():
        rf = ref.encode_image(
            torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2)))
        rf = torch.nn.functional.normalize(rf, dim=-1).numpy()
    err = float(np.abs(np.asarray(feats, np.float32) - rf).max())
    print(f"max |err| vs reference: {err:.2e}")
    assert err <= 1e-3, "parity bar (BASELINE.json) violated"
EOF

# 4. the BASELINE config #2 CLI path (zero-shot + --save-embed)
if [ $# -ge 1 ]; then
    PATHMNIST_VAL="$1" bash "$REPO/pathmnist_test.sh" --logs /tmp/real_weights_smoke
    echo "zero-shot + --save-embed artifacts under /tmp/real_weights_smoke"
else
    echo "no VAL_DIR given - skipped the CLI zero-shot step"
fi
echo "real-weights smoke PASSED"
