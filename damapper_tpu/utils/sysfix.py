"""Host-environment guards.

ensure_map_count: a long-lived JAX CPU process accumulates thousands of
mmaps (one per loaded/compiled executable's code+data pages, plus arena
mappings); at the stock vm.max_map_count=65530 the full test suite
deterministically segfaults inside XLA's compile or executable-serialize
path once the map table fills (observed: crashes in
backend_compile_and_load / compilation_cache.put_executable_and_time with
libgcc_s unwinder frames; kernel logs a libgcc_s segfault).  Raising the
limit is the fix; this helper does it best-effort when running privileged
and is silent otherwise.
"""

import os


def ensure_map_count(min_maps: int = 1 << 20) -> int:
    """Raise vm.max_map_count to at least `min_maps` if possible.

    Returns the (possibly unchanged) current value, or -1 if unreadable.
    Never lowers the limit; never raises."""
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as fh:
            cur = int(fh.read().strip())
    except OSError:
        return -1
    if cur >= min_maps:
        return cur
    try:
        with open(path, "w") as fh:
            fh.write(str(min_maps))
        return min_maps
    except OSError:
        if os.environ.get("DAMAPPER_VERBOSE_SYSFIX"):
            import sys
            print(f"warning: vm.max_map_count={cur} (<{min_maps}); "
                  "long CPU test runs may segfault in XLA — raise it with "
                  f"`sysctl -w vm.max_map_count={min_maps}`",
                  file=sys.stderr)
        return cur
