import numpy as np

int64 = np.int64
float64 = np.float64
