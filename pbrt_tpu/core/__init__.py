"""Core abstractions: math, RNG, spectrum, film, paramset, parser, API."""
