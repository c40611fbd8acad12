"""Image + asset IO: EXR/PNG/BMP/HDR/RAW codecs and glTF loading."""
