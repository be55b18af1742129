"""Native C++ runtime components (wire codec).

codec.cpp implements the RZK1 zigzag-varint encoder/decoder as a shared
library (build: scripts/build_native.sh); utils/serial.py loads it via
ctypes and falls back to the numpy codec when libcodec.so is absent, so a
pure-Python install of the package stays fully functional.
"""
