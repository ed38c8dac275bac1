"""Version constants.

HULK_COMPAT_VERSION is embedded in every sketch JSON and enforced at load,
mirroring the reference's hard version pinning (src/sketchio/sketchio.go:174-176,
src/version/version.go:3). It must read "1.0.0" so sketches interchange with
the Go reference. FRAMEWORK_VERSION tracks this TPU-native implementation.
"""

HULK_COMPAT_VERSION = "1.0.0"
FRAMEWORK_VERSION = "0.1.0"
