"""Core compute primitives: integrators, exact linear solves, losses,
tridiagonal solves, Frechet distance, Levenberg-Marquardt, Morris sampling,
evolutionary multi-objective search."""
