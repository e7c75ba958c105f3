#!/bin/bash
# Build and push the multi-arch image with a unique timestamped tag
# (parity with reference build.sh).
#
# The registry path has no usable default (docker-bake.hcl ships a
# placeholder owner): set IMAGE_NAME explicitly, or run in CI where
# GITHUB_REPOSITORY provides it.
set -euo pipefail
if [ -z "${IMAGE_NAME:-}" ]; then
    if [ -n "${GITHUB_REPOSITORY:-}" ]; then
        IMAGE_NAME="ghcr.io/${GITHUB_REPOSITORY}"
    else
        echo "error: set IMAGE_NAME (e.g. IMAGE_NAME=ghcr.io/<owner>/audio_pattern_detector_tpu ./build.sh)" >&2
        exit 1
    fi
fi
export IMAGE_NAME
TAG=$(date -u '+%Y%m%d%H%M%S')-$(openssl rand -base64 4 | tr -d "=+/") docker buildx bake -f docker-bake.hcl image-all --push
