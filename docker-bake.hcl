// Multi-arch image bake (parity with reference docker-bake.hcl).
variable "TAG" {
}

// No usable default exists until the repository has a public owner:
// build.sh requires IMAGE_NAME (or derives it from GITHUB_REPOSITORY in
// CI) and exports it over this placeholder.
variable "IMAGE_NAME" {
    default = "ghcr.io/OWNER/audio_pattern_detector_tpu"
}

group "default" {
    targets = ["worker"]
}

target "worker" {
    dockerfile = "Dockerfile"
    // both the tag and latest
    tags = ["${IMAGE_NAME}:${TAG}", "${IMAGE_NAME}"]
}

target "worker_multi" {
    inherits = ["worker"]
    platforms = ["linux/amd64", "linux/arm64"]
}

target "worker_amd64_only" {
    inherits = ["worker"]
    platforms = ["linux/amd64"]
}

group "image-all" {
    targets = ["worker_multi"]
}
