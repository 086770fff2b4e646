"""Binary pack/unpack helpers and platform constants
(reference system.py:28-80).  The engine itself encodes postings with
the vectorized numpy codec in ``state/codec.py``; these scalar struct
helpers exist for user code that imported them from the reference.
"""

import sys
from struct import Struct, calcsize

IS_LITTLE = sys.byteorder == "little"

_INT_SIZE = calcsize("!i")
_SHORT_SIZE = calcsize("!H")
_LONG_SIZE = calcsize("!Q")
_FLOAT_SIZE = calcsize("!f")
_DOUBLE_SIZE = calcsize("!d")

_byte_struct = Struct("!B")
_sbyte_struct = Struct("!b")
_ushort_struct = Struct("!H")
_int_struct = Struct("!i")
_uint_struct = Struct("!I")
_long_struct = Struct("!q")
_ulong_struct = Struct("!Q")
_float_struct = Struct("!f")
_double_struct = Struct("!d")
_ushort_le_struct = Struct("<H")
_uint_le_struct = Struct("<I")

pack_byte = _byte_struct.pack
pack_sbyte = _sbyte_struct.pack
pack_ushort = _ushort_struct.pack
pack_int = _int_struct.pack
pack_uint = _uint_struct.pack
pack_long = _long_struct.pack
pack_ulong = _ulong_struct.pack
pack_float = _float_struct.pack
pack_double = _double_struct.pack
pack_ushort_le = _ushort_le_struct.pack
pack_uint_le = _uint_le_struct.pack

unpack_byte = _byte_struct.unpack
unpack_sbyte = _sbyte_struct.unpack
unpack_ushort = _ushort_struct.unpack
unpack_int = _int_struct.unpack
unpack_uint = _uint_struct.unpack
unpack_long = _long_struct.unpack
unpack_ulong = _ulong_struct.unpack
unpack_float = _float_struct.unpack
unpack_double = _double_struct.unpack
unpack_ushort_le = _ushort_le_struct.unpack
unpack_uint_le = _uint_le_struct.unpack

emptybytes = b""
