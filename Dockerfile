# TPU-native OCTA-autosegmentation framework.
# Mirrors the reference's docker packaging (reference Dockerfile +
# docker/dockershell.sh modes: segmentation | generation | transformation |
# visualization), re-based on a JAX TPU runtime.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /home/OCTA-seg

COPY pyproject.toml README.md ./
COPY octa_tpu ./octa_tpu
COPY configs ./configs
COPY scripts ./scripts
COPY datasets ./datasets
COPY docker ./docker
COPY train.py test.py validate.py generate_vessel_graph.py \
     visualize_vessel_graphs.py ROI_cropping.py bayesOpt.py \
     bayesOpt_noise.py bayesOpt_skrgan.py ./

# TPU runtime (falls back to CPU where no TPU is attached)
RUN pip install --no-cache-dir "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .

# modes: segmentation | generation | transformation | visualization
ENTRYPOINT ["bash", "./scripts/run_modes.sh"]
CMD ["segmentation"]
