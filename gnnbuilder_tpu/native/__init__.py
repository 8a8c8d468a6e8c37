"""Native (C++) host-side helpers.

The reference implements its graph-format builders, binary IO and testbench
in C++ (gnn_builder_lib.h, model_tb.cpp.jinja).  The TPU-native framework
keeps the device compute path in JAX/Pallas but implements the host hot
paths — edge sorting, CSR packing, binary golden-data IO — in C++ as well,
compiled with g++ into ``libgnnb_packing.so`` and loaded via ctypes.
"""

from gnnbuilder_tpu.native import lib  # noqa: F401
