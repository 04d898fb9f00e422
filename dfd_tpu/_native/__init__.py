"""Container package for the compiled native env pool.

Wheel builds place ``libdfd_envpool.so`` here (see setup.py); source
checkouts build it in ``runtime/`` instead.  The ctypes loader
(``dfd_tpu.envs.native_pool``) searches both locations plus the
``DFD_ENVPOOL_LIB`` environment variable.
"""
