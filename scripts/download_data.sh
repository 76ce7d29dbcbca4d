#!/usr/bin/env bash
# Fetch the standard demo datasets (equivalent of the reference
# download_data.sh): tiny_nerf_data.npz + the nerf_synthetic lego scene.
# In network-less environments, generate the procedural scene instead:
#   python -c "from nerf_simple_tpu.data.synthetic import write_blender_scene; \
#              write_blender_scene('data/synthetic_blobs', n_train=25, H=400, W=400)"
set -euo pipefail
mkdir -p data
cd data
wget -nc http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/tiny_nerf_data.npz
wget -nc http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/nerf_example_data.zip
unzip -n nerf_example_data.zip
