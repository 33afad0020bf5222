"""Minimal xarray-compatible stand-in for the test environment.

The real xarray is not installable in this image, which previously left
the package's DataArray-coercion, time_metadata='auto' season derivation
and netCDF-export code paths implemented but never executed (the suite's
single skip). This stub implements exactly the surface dl4ds_tpu touches
— `DataArray` with `.values`, `.coords` mapping, coordinate attribute
access (`da.time.values`), leading-dim slicing with coordinate
propagation, and `.to_netcdf()` via scipy's NETCDF3 writer — so those
paths run for real. It is appended to sys.path by tests/conftest.py ONLY
when `import xarray` fails; it never shadows a real installation.
"""

import numpy as np

__version__ = '0.0.0-dl4ds-test-stub'


class _Coord:
    """A coordinate: ndarray wrapper exposing .values like xarray."""

    def __init__(self, values):
        self.values = np.asarray(values)

    def __len__(self):
        return len(self.values)

    def __array__(self, dtype=None, copy=None):
        v = self.values
        return v.astype(dtype) if dtype is not None else v

    def __getitem__(self, key):
        return _Coord(self.values[key])

    def __repr__(self):
        return f'_Coord({self.values!r})'


class DataArray:
    def __init__(self, data=None, dims=None, coords=None, name=None,
                 attrs=None):
        self.values = np.asarray(data)
        if dims is None:
            dims = tuple(f'dim_{i}' for i in range(self.values.ndim))
        self.dims = tuple(dims)
        self.coords = {
            k: v if isinstance(v, _Coord) else _Coord(getattr(v, 'values', v))
            for k, v in (coords or {}).items()}
        self.name = name
        self.attrs = dict(attrs or {})

    # -- array-ish surface -------------------------------------------------
    @property
    def shape(self):
        return self.values.shape

    @property
    def ndim(self):
        return self.values.ndim

    @property
    def dtype(self):
        return self.values.dtype

    def __len__(self):
        return len(self.values)

    def __array__(self, dtype=None, copy=None):
        v = self.values
        return v.astype(dtype) if dtype is not None else v

    def __getattr__(self, key):
        coords = object.__getattribute__(self, '__dict__').get('coords', {})
        if key in coords:
            return coords[key]
        raise AttributeError(key)

    def __getitem__(self, key):
        vals = self.values[key]
        k0 = key[0] if isinstance(key, tuple) else key
        dims = self.dims
        coords = dict(self.coords)
        if isinstance(k0, (int, np.integer)):
            dims = dims[1:]
            coords.pop(self.dims[0], None)
        elif self.dims and self.dims[0] in coords:
            coords[self.dims[0]] = coords[self.dims[0]][k0]
        return DataArray(vals, dims=dims[:vals.ndim], coords=coords,
                         name=self.name, attrs=self.attrs)

    def __repr__(self):
        return (f'<stub xarray.DataArray {self.name or ""} '
                f'{self.dims} {self.values.shape}>')

    # -- io ----------------------------------------------------------------
    def to_netcdf(self, path):
        """NETCDF3 export via scipy (datetimes encoded as int64
        nanoseconds since epoch, CF-style units attribute)."""
        from scipy.io import netcdf_file
        with netcdf_file(path, 'w') as f:
            for d, n in zip(self.dims, self.values.shape):
                f.createDimension(d, n)
            name = self.name or 'data'
            var = f.createVariable(name, self.values.dtype.newbyteorder('='),
                                   self.dims)
            var[:] = self.values
            for cname, coord in self.coords.items():
                if cname not in self.dims:
                    continue
                cv = coord.values
                if np.issubdtype(cv.dtype, np.datetime64):
                    # NETCDF3 has no int64: CF-style float64 seconds
                    cvar = f.createVariable(cname, 'd', (cname,))
                    cvar[:] = cv.astype('datetime64[s]').astype('float64')
                    cvar.units = 'seconds since 1970-01-01'
                else:
                    cvar = f.createVariable(
                        cname, cv.dtype.newbyteorder('='), (cname,))
                    cvar[:] = cv


def open_dataarray(path):
    """Inverse of DataArray.to_netcdf above (NETCDF3 via scipy)."""
    from scipy.io import netcdf_file
    with netcdf_file(path, 'r') as f:
        dim_names = set(f.dimensions)
        data_vars = {k: v for k, v in f.variables.items()
                     if k not in dim_names}
        (name, var), = data_vars.items()
        coords = {}
        for cname in var.dimensions:
            if cname in f.variables:
                cv = np.array(f.variables[cname][:])
                units = getattr(f.variables[cname], 'units', b'')
                if b'seconds since 1970-01-01' in bytes(units):
                    cv = cv.astype('int64').astype('datetime64[s]')
                coords[cname] = cv
        return DataArray(np.array(var[:]), dims=var.dimensions,
                         coords=coords, name=name)
