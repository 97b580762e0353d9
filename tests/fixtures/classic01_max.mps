* CLASSIC01 — hand-authored maximize LP with a hand-verifiable optimum
* (VERDICT r4 item 8: a classic-style instance with an independently
* checkable objective, exercising RANGES on all three row types and EVERY
* BOUNDS code the reader supports: LO, UP, FX, FR, MI, PL, LI, UI).
*
* Problem (maximize sense; objective constant via RHS on the N row):
*   max  3 X1 + 2 X2 + X3 - X4 + 2 X5 + X6 - 10
*   s.t. R1 (L, rhs 6, range 4):   2 <= X1 + X2 <= 6
*        R2 (G, rhs 1, range 3):   1 <= X3 + X4 <= 4
*        R3 (E, rhs 5, range +2):  5 <= X5 + X6 <= 7
*        0 <= X1 <= 3;  0.5 <= X2 <= 5;  X3 = 2 (FX);  X4 free (FR);
*        -inf < X5 <= 10 (MI+UP);  1 <= X6 < +inf (LI+PL)
*
* Hand derivation (the three row groups decouple):
*   R1 group: max 3 X1 + 2 X2 on X1+X2 <= 6, X1 <= 3, X2 in [0.5, 5]
*     -> both costs positive, fill the larger first: X1* = 3, X2* = 3
*        (contribution 15).
*   R2 group: X3 = 2 fixed; 1 <= 2 + X4 <= 4 -> X4 in [-1, 2]; cost -X4
*     is maximized at X4* = -1 (contribution 1*2 - 1*(-1) = 3).
*   R3 group: max 2 X5 + X6 on X5 + X6 <= 7, X6 >= 1, X5 <= 10
*     -> prefer X5: binding X5 + X6 = 7 with X6 at its floor 1:
*        X5* = 6, X6* = 1 (contribution 13).
*   c@x* = 15 + 3 + 13 = 31;  OPTIMAL OBJECTIVE = 31 - 10 = 21 (maximize).
*   x* = (3, 3, 2, -1, 6, 1), unique.
NAME CLASSIC01
OBJSENSE
    MAX
ROWS
 N  COST
 L  R1
 G  R2
 E  R3
COLUMNS
    X1  COST  3.0  R1  1.0
    X2  COST  2.0  R1  1.0
    X3  COST  1.0  R2  1.0
    X4  COST  -1.0  R2  1.0
    X5  COST  2.0  R3  1.0
    X6  COST  1.0  R3  1.0
RHS
    RHS  R1  6.0  R2  1.0
    RHS  R3  5.0  COST  10.0
RANGES
    RNG  R1  4.0  R2  3.0
    RNG  R3  2.0
BOUNDS
 UP BND X1 3.0
 LO BND X2 0.5
 UI BND X2 5
 FX BND X3 2.0
 FR BND X4
 MI BND X5
 UP BND X5 10.0
 LI BND X6 1
 PL BND X6
ENDATA
