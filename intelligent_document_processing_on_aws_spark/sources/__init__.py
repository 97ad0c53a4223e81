"""Sources: synthetic distributed pages source + warehouse helpers."""
