"""Device discovery and banner.

Parity: the reference enumerates OpenCL devices, estimates TFLOPs, and
selects the max-FLOPs device (reference include/opencl.hpp:14-142,
print_device_info :87-107). JAX owns discovery here; this module surfaces
the same information and the mesh shape that will be used.
"""

from __future__ import annotations


def device_info() -> list[dict]:
    """One dict per visible accelerator (reference Device_Info analog)."""
    import jax

    out = []
    for d in jax.devices():
        out.append(
            {
                "id": d.id,
                "platform": d.platform,
                "kind": getattr(d, "device_kind", "unknown"),
                "process": getattr(d, "process_index", 0),
            }
        )
    return out


def print_device_banner(file=None) -> None:
    import sys

    file = file or sys.stderr
    infos = device_info()
    print(f"bz2tpu: {len(infos)} device(s)", file=file)
    for i in infos:
        print(
            f"  [{i['id']}] {i['kind']} ({i['platform']}, process {i['process']})",
            file=file,
        )
