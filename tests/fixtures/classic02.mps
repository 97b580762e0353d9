* CLASSIC02 — hand-authored minimize LP with a hand-verifiable optimum
* (VERDICT r4 item 8).  Exercises the Netlib NEGATIVE-UP convention (UP
* with a negative value and no prior LO drops the lower bound to -inf)
* and a NEGATIVE range on an E row (lo = rhs + range, hi = rhs).
*
* Problem:
*   min  X1 + 2 X2 + 3 X3
*   s.t. R1 (E, rhs 4, range -2):  2 <= X1 + X2 + X3 <= 4
*        R2 (G, rhs 0):            X2 - X3 >= 0
*        X1 <= -1 with free lower bound (negative-UP);  X2 >= 1;  X3 >= 0
*
* Hand derivation:
*   X1 has cost +1 and no lower bound, but lowering X1 below -1 must be
*   compensated through R1's lower limit by X2 (cost 2) or X3 (cost 3) —
*   net loss — so X1* = -1 (its upper bound).  Then X2 + X3 >= 3 with X2
*   the cheaper: X2* = 3, X3* = 0 (R2: 3 - 0 >= 0 slack).
*   OPTIMAL OBJECTIVE = -1 + 6 + 0 = 5;  x* = (-1, 3, 0), unique.
NAME CLASSIC02
ROWS
 N  OBJ
 E  R1
 G  R2
COLUMNS
    X1  OBJ  1.0  R1  1.0
    X2  OBJ  2.0  R1  1.0  R2  1.0
    X3  OBJ  3.0  R1  1.0  R2  -1.0
RHS
    RHS  R1  4.0
RANGES
    RNG  R1  -2.0
BOUNDS
 UP BND X1 -1.0
 LO BND X2 1.0
ENDATA
