"""Pure kernels: geo math, cell indexes, codecs, hashes, text scoring."""
