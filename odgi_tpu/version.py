"""Version info (reference: src/version.{hpp,cpp} + version_main.cpp).

The reference derives its version from git tags at build time
(scripts/generate_git_version.sh) and maps releases to codenames
(src/version.cpp:28-40).  We keep the same three-part surface:
release / version / codename, with `get_short()` = "release-codename".
"""

RELEASE = "v0.1.0"
VERSION = RELEASE + "-tpu"
CODENAME = "systolic pangenome"


def get_release() -> str:
    return RELEASE


def get_version() -> str:
    return VERSION


def get_codename() -> str:
    return CODENAME


def get_short() -> str:
    return f"{RELEASE}-{CODENAME}"
