"""Loss-surface .h5 → ParaView .vtp (VTK XML PolyData) converter.

Reference: ``basicsr/utils/h52vtp.py`` (325 L of per-point ``write`` calls).
This is a vectorized rewrite with the same input contract (an h5 file with
``xcoordinates``/``ycoordinates`` vectors and a ``surf_name`` value grid, as
produced by loss-landscape tooling) and byte-identical output in the default
polys mode — including the reference's quirky wrapping (a trailing space on
partial final lines) so its files diff clean against ours.

The ``interp > 0`` upsampling path uses ``RectBivariateSpline`` (bicubic on
a regular grid): ``scipy.interpolate.interp2d``, which the reference calls,
was removed in SciPy 1.14 and RectBivariateSpline is its documented
replacement for gridded data.
"""

from __future__ import annotations

import argparse
import math

import numpy as np


def _wrap(strs, per_line, prefix="          "):
    """Reference line-wrapping: ``per_line`` items per row; a partial final
    row keeps the trailing item separator (h52vtp.py:141-151 semantics)."""
    out = []
    for i in range(0, len(strs), per_line):
        group = strs[i : i + per_line]
        out.append(prefix + " ".join(group) + ("\n" if len(group) == per_line else " \n"))
    return "".join(out)


def _scalar_array(name, vals, vmin, vmax, per_line=6):
    head = (
        f'        <DataArray type="Float32" Name="{name}" NumberOfComponents="1" '
        f'format="ascii" RangeMin="{vmin}" RangeMax="{vmax}">\n'
    )
    return head + _wrap([str(v) for v in vals], per_line) + "        </DataArray>\n"


def h5_to_vtp(surf_file, surf_name="train_loss", log=True, zmax=100, interp=-1,
              show_points=False, show_polys=True):
    import h5py

    with h5py.File(surf_file, "r") as f:
        xcoordinates, ycoordinates = np.meshgrid(f["xcoordinates"][:], f["ycoordinates"][:][:])
        vals = f[surf_name][:]

    x_array = xcoordinates[:].ravel()
    y_array = ycoordinates[:].ravel()
    z_array = vals[:].ravel()

    if interp > 0:
        from scipy.interpolate import RectBivariateSpline

        m = RectBivariateSpline(ycoordinates[:, 0], xcoordinates[0, :], vals)
        xi = np.linspace(min(x_array), max(x_array), interp)
        yi = np.linspace(min(y_array), max(y_array), interp)
        z_array = m(yi, xi).ravel()
        x_array, y_array = np.meshgrid(xi, yi)
        x_array = x_array.ravel()
        y_array = y_array.ravel()

    vtp_file = surf_file[:-3] + "_" + surf_name
    if zmax > 0:
        z_array[z_array > zmax] = zmax
        vtp_file += "_zmax=" + str(zmax)
    if log:
        z_array = np.log(z_array + 0.1)
        vtp_file += "_log"
    vtp_file += ".vtp"
    print("Here's your output file:{}".format(vtp_file))

    number_points = len(z_array)
    matrix_size = int(math.sqrt(number_points))
    poly_size = matrix_size - 1
    number_polys = poly_size * poly_size
    print("number_points = {} points".format(number_points))
    print("matrix_size = {} x {}".format(matrix_size, matrix_size))
    print("poly_size = {} x {}".format(poly_size, poly_size))
    print("number_polys = {}".format(number_polys))

    min_value_array = [min(x_array), min(y_array), min(z_array)]
    max_value_array = [max(x_array), max(y_array), max(z_array)]
    min_value = min(min_value_array)
    max_value = max(max_value_array)

    # per-quad averaged z, vectorized over the (poly_size, poly_size) grid of
    # top-left corners (reference: the nested column/row loop at :91-105)
    tl = (np.arange(poly_size)[:, None] * matrix_size + np.arange(poly_size)[None, :]).ravel()
    averaged_z = (z_array[tl] + z_array[tl + 1] + z_array[tl + matrix_size]
                  + z_array[tl + matrix_size + 1]) / 4.0

    parts = [
        '<VTKFile type="PolyData" version="1.0" byte_order="LittleEndian" header_type="UInt64">\n',
        "  <PolyData>\n",
    ]
    if show_points and show_polys:
        parts.append(
            '    <Piece NumberOfPoints="{}" NumberOfVerts="{}" NumberOfLines="0" '
            'NumberOfStrips="0" NumberOfPolys="{}">\n'.format(number_points, number_points, number_polys))
    elif show_polys:
        parts.append(
            '    <Piece NumberOfPoints="{}" NumberOfVerts="0" NumberOfLines="0" '
            'NumberOfStrips="0" NumberOfPolys="{}">\n'.format(number_points, number_polys))
    else:
        parts.append(
            '    <Piece NumberOfPoints="{}" NumberOfVerts="{}" NumberOfLines="0" '
            'NumberOfStrips="0" NumberOfPolys="">\n'.format(number_points, number_points))

    parts.append("      <PointData>\n")
    parts.append(_scalar_array("zvalue", z_array, min_value_array[2], max_value_array[2]))
    parts.append("      </PointData>\n")

    parts.append("      <CellData>\n")
    if show_polys and not show_points:
        parts.append(_scalar_array("averaged zvalue", averaged_z, min(averaged_z), max(averaged_z)))
    parts.append("      </CellData>\n")

    parts.append("      <Points>\n")
    parts.append(
        '        <DataArray type="Float32" Name="Points" NumberOfComponents="3" '
        'format="ascii" RangeMin="{}" RangeMax="{}">\n'.format(min_value, max_value))
    triplets = ["{} {} {}".format(x_array[i], y_array[i], z_array[i]) for i in range(number_points)]
    parts.append(_wrap(triplets, 2))
    parts.append("        </DataArray>\n      </Points>\n")

    parts.append("      <Verts>\n")
    parts.append(
        '        <DataArray type="Int64" Name="connectivity" format="ascii" '
        'RangeMin="0" RangeMax="{}">\n'.format(number_points - 1))
    if show_points:
        parts.append(_wrap([str(i) for i in range(number_points)], 6))
    parts.append("        </DataArray>\n")
    parts.append(
        '        <DataArray type="Int64" Name="offsets" format="ascii" '
        'RangeMin="1" RangeMax="{}">\n'.format(number_points))
    if show_points:
        parts.append(_wrap([str(i + 1) for i in range(number_points)], 6))
    parts.append("        </DataArray>\n      </Verts>\n")

    for section in ("Lines", "Strips"):
        parts.append("      <{}>\n".format(section))
        parts.append(
            '        <DataArray type="Int64" Name="connectivity" format="ascii" '
            'RangeMin="0" RangeMax="{}">\n        </DataArray>\n'.format(number_polys - 1))
        parts.append(
            '        <DataArray type="Int64" Name="offsets" format="ascii" '
            'RangeMin="1" RangeMax="{}">\n        </DataArray>\n'.format(number_polys))
        parts.append("      </{}>\n".format(section))

    parts.append("      <Polys>\n")
    parts.append(
        '        <DataArray type="Int64" Name="connectivity" format="ascii" '
        'RangeMin="0" RangeMax="{}">\n'.format(number_polys - 1))
    if show_polys:
        quads = ["{} {} {} {}".format(i, i + 1, i + matrix_size + 1, i + matrix_size) for i in tl]
        parts.append(_wrap(quads, 2))
    parts.append("        </DataArray>\n")
    parts.append(
        '        <DataArray type="Int64" Name="offsets" format="ascii" '
        'RangeMin="1" RangeMax="{}">\n'.format(number_polys))
    if show_polys:
        parts.append(_wrap([str((i + 1) * 4) for i in range(number_polys)], 6))
    parts.append("        </DataArray>\n      </Polys>\n")

    parts.append("    </Piece>\n  </PolyData>\n</VTKFile>\n")
    with open(vtp_file, "w") as out:
        out.write("".join(parts))
    print("Done with file:{}".format(vtp_file))
    return vtp_file


def main() -> None:
    parser = argparse.ArgumentParser(description="Convert h5 loss-surface files to .vtp for ParaView")
    parser.add_argument("--surf_file", "-f", required=True, help="The h5 file that contains surface values")
    parser.add_argument("--surf_name", default="train_loss", help="The surface to convert")
    parser.add_argument("--zmax", default=100, type=float, help="Maximum z value to map")
    parser.add_argument("--interp", default=-1, type=int, help="Interpolate the surface to this resolution (1000 recommended)")
    parser.add_argument("--log", action="store_true", default=False, help="Use log scale for loss values")
    args = parser.parse_args()
    h5_to_vtp(args.surf_file, args.surf_name, log=args.log, zmax=args.zmax, interp=args.interp)


if __name__ == "__main__":
    main()
