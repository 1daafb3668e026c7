"""Pure-NumPy oracle kernels.

Every kernel here is a pure function with semantics specified from the
reference C source (file:line cited in each docstring). The Spark
pipeline calls these same functions inside pandas/Arrow UDFs, so
"oracle == Spark" holds by construction; tests additionally pin the
semantics with hand-enumerable micro-cases.
"""
