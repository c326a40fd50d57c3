"""BFS Re=400 10x10 golden centerline (reference artifact
outputs/bfs_Re400_centerline.dat), kept inline so tests run without the
reference checkout."""

import numpy as np

GOLDEN_U = np.array(
    [-0.237831, 0.109549, 0.433739, 0.773114, 1.083311,
     1.276518, 1.293460, 1.106460, 0.714866, 0.139942]
)
GOLDEN_V = np.array(
    [-0.010094, -0.035309, -0.083102, -0.136524, -0.144959,
     -0.121064, -0.088111, -0.054283, -0.040627, -0.020261]
)
