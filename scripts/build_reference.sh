#!/bin/bash
# Rebuild the HiFiLES reference CPU binary in /tmp for golden generation
# (/tmp is wiped between rounds).  OpenBLAS comes from scipy's bundled
# LP64 library via a small cblas shim; the build also widens error.dat
# to 16 significant digits (ref:src/output.cpp:2129-2148 prints 7 by
# default, which capped the vortex-parity comparison at ~4e-10).
#
# Usage: bash scripts/build_reference.sh
# Result: /tmp/refsrc/bin/HiFiLES (+ symlink HiFiLES_blas)
# Run with: LD_LIBRARY_PATH=/tmp/cblas_shim HIFILES_HOME=/root/reference
set -e

SCIPY_LIBS=/opt/venv/lib/python3.12/site-packages/scipy.libs
OPENBLAS=$(ls $SCIPY_LIBS/libscipy_openblas-*.so | head -1)
SHIM=/tmp/cblas_shim

mkdir -p $SHIM
cp "$OPENBLAS" $SHIM/
cp $SCIPY_LIBS/libgfortran-*.so* $SCIPY_LIBS/libquadmath-*.so* $SHIM/
OPENBLAS_NAME=$(basename "$OPENBLAS")

cat > $SHIM/cblas.h <<'EOF'
#ifndef CBLAS_SHIM_H
#define CBLAS_SHIM_H
#ifdef __cplusplus
extern "C" {
#endif
enum CBLAS_ORDER {CblasRowMajor=101, CblasColMajor=102};
enum CBLAS_TRANSPOSE {CblasNoTrans=111, CblasTrans=112, CblasConjTrans=113};
double cblas_dasum(int n, const double *x, int incx);
void cblas_daxpy(int n, double a, const double *x, int incx,
                 double *y, int incy);
double cblas_ddot(int n, const double *x, int incx,
                  const double *y, int incy);
void cblas_dgemm(enum CBLAS_ORDER order, enum CBLAS_TRANSPOSE ta,
                 enum CBLAS_TRANSPOSE tb, int m, int n, int k,
                 double alpha, const double *a, int lda,
                 const double *b, int ldb, double beta,
                 double *c, int ldc);
void cblas_dgemv(enum CBLAS_ORDER order, enum CBLAS_TRANSPOSE ta,
                 int m, int n, double alpha, const double *a, int lda,
                 const double *x, int incx, double beta,
                 double *y, int incy);
void vdSqr(int n, const double *a, double *r);
#ifdef __cplusplus
}
#endif
#endif
EOF

cat > $SHIM/shim.c <<'EOF'
/* forward cblas_* to scipy's prefixed LP64 OpenBLAS symbols */
#include "cblas.h"
double scipy_cblas_dasum(int, const double*, int);
void scipy_cblas_daxpy(int, double, const double*, int, double*, int);
double scipy_cblas_ddot(int, const double*, int, const double*, int);
void scipy_cblas_dgemm(int, int, int, int, int, int, double,
                       const double*, int, const double*, int, double,
                       double*, int);
void scipy_cblas_dgemv(int, int, int, int, double, const double*, int,
                       const double*, int, double, double*, int);
double cblas_dasum(int n, const double *x, int ix)
{ return scipy_cblas_dasum(n, x, ix); }
void cblas_daxpy(int n, double a, const double *x, int ix,
                 double *y, int iy)
{ scipy_cblas_daxpy(n, a, x, ix, y, iy); }
double cblas_ddot(int n, const double *x, int ix, const double *y, int iy)
{ return scipy_cblas_ddot(n, x, ix, y, iy); }
void cblas_dgemm(enum CBLAS_ORDER o, enum CBLAS_TRANSPOSE ta,
                 enum CBLAS_TRANSPOSE tb, int m, int n, int k,
                 double alpha, const double *a, int lda,
                 const double *b, int ldb, double beta, double *c, int ldc)
{ scipy_cblas_dgemm(o, ta, tb, m, n, k, alpha, a, lda, b, ldb,
                    beta, c, ldc); }
void cblas_dgemv(enum CBLAS_ORDER o, enum CBLAS_TRANSPOSE ta, int m, int n,
                 double alpha, const double *a, int lda, const double *x,
                 int ix, double beta, double *y, int iy)
{ scipy_cblas_dgemv(o, ta, m, n, alpha, a, lda, x, ix, beta, y, iy); }
EOF

cat > $SHIM/vml.c <<'EOF'
/* the reference wrongly guards this MKL-VML call under _STANDARD_BLAS */
void vdSqr(int n, const double *a, double *r)
{ for (int i = 0; i < n; ++i) r[i] = a[i] * a[i]; }
EOF

(cd $SHIM && gcc -shared -fPIC -O2 shim.c vml.c -o libcblas.so \
    -L. -l:$OPENBLAS_NAME -Wl,-rpath,$SHIM)
# CMake links `cblas blas gfortran`; satisfy the extra names with stubs
(cd $SHIM && echo | gcc -shared -fPIC -x c - -o libblas.so \
    && cp libblas.so libgfortran.so)

rm -rf /tmp/refsrc
cp -r /root/reference /tmp/refsrc
# widen error.dat to 16 significant digits (vortex-parity golden)
sed -i 's/write_error << scientific <</write_error << scientific << setprecision(16) <</g' \
    /tmp/refsrc/src/output.cpp
grep -c "setprecision(16)" /tmp/refsrc/src/output.cpp

cd /tmp/refsrc
cmake . -DBLAS=CBLAS -DBLAS_LD=$SHIM -DBLAS_INCLUDE=$SHIM \
    -DUSE_CGNS=OFF -DUSE_HDF5=OFF -DPARALLEL=OFF > /tmp/ref_cmake.log
make -j1 > /tmp/ref_make.log 2>&1 || (tail -30 /tmp/ref_make.log; exit 1)
ln -sf /tmp/refsrc/bin/HiFiLES /tmp/refsrc/bin/HiFiLES_blas
echo "reference binary built: /tmp/refsrc/bin/HiFiLES"
