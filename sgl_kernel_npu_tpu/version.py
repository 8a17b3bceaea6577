"""Version stamping (reference parity: csrc/utils/version.h:23-27 stamps the git
commit into the .so; here we stamp the package version + commit into the module)."""

__version__ = "0.1.0"


def git_commit() -> str:
    import subprocess

    try:
        return (
            subprocess.check_output(
                ["git", "rev-parse", "--short", "HEAD"],
                stderr=subprocess.DEVNULL,
                cwd=__file__.rsplit("/", 2)[0],
            )
            .decode()
            .strip()
        )
    except Exception:
        return "unknown"
